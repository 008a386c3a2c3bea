"""Validate Pallas kernels on real TPU hardware (run manually; CI forces CPU).

Checks the fused kNN kernel against the jnp reference on-device and reports
search throughput at two index sizes.  Exit nonzero on parity failure.
"""
import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from adaptive_classifier_tpu.ops import knn

r = np.random.default_rng(0)
for C in (1024, 16384):
    D, B, k = 768, 256, 10
    p = r.standard_normal((C, D)).astype(np.float32)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    q = r.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pj, qj, vj = jnp.asarray(p), jnp.asarray(q), jnp.ones(C, bool)

    # parity pallas vs ref on real hardware
    ref = np.asarray(knn.masked_sims_ref(qj, pj, vj))
    got = np.asarray(knn.masked_sims(qj, pj, vj, use_pallas=True))
    err = np.abs(got - ref).max()
    print(f"C={C}: pallas-vs-ref max err {err:.2e}")
    assert err < 1e-4

    @jax.jit
    def search(qq):
        sims = knn.masked_sims(qq, pj, vj, use_pallas=True)
        return knn.topk_scores(sims, vj, k)

    s, i = search(qj); np.asarray(s)
    qs = [jnp.asarray(r.standard_normal((B, D)).astype(np.float32)) for _ in range(10)]
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for qq in qs:
        s, i = search(qq)
        acc = acc + jnp.sum(s)
    float(acc)
    dt = time.perf_counter() - t0
    print(f"C={C}: device kNN {B*10/dt:.0f} q/s")
