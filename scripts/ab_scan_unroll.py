"""Encoder-variant A/B harness (run manually on TPU).

The encoder is 100%% of end-to-end pipeline time (measured: encoder-only
6683 q/s == full pipeline 6693 q/s), so layer-body variants are where
throughput work happens.  See docs/ROADMAP.md.
"""
import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from adaptive_classifier_tpu.models.encoder import EncoderConfig, init_params_on_device, _layer_norm

cfg = EncoderConfig(vocab_size=30522)
params = init_params_on_device(0, cfg)
r = np.random.default_rng(0)
B, S = 256, 64
mask = jnp.ones((B, S), jnp.int32)
D, H, Dh = 768, 12, 64
scale = 1.0 / np.sqrt(Dh)
cd = jnp.bfloat16

def fwd(p, ids, unroll):
    emb = p["embeddings"]
    h = emb["word"][ids] + emb["position"][jnp.arange(S)][None] + emb["token_type"][0][None, None]
    h = _layer_norm(h, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps).astype(cd)
    amask = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    def body(h, lp):
        x = h
        def proj(w, b):
            y = jnp.einsum("bsd,de->bse", x, w.astype(cd), preferred_element_type=jnp.float32)
            return (y + b.astype(jnp.float32)).astype(cd)
        q = proj(lp["q_w"], lp["q_b"]).reshape(B, S, H, Dh)
        k = proj(lp["k_w"], lp["k_b"]).reshape(B, S, H, Dh)
        v = proj(lp["v_w"], lp["v_b"]).reshape(B, S, H, Dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale + amask
        probs = jax.nn.softmax(logits, -1).astype(cd)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32).reshape(B, S, D).astype(cd)
        a = jnp.einsum("bsd,de->bse", ctx, lp["o_w"].astype(cd), preferred_element_type=jnp.float32) + lp["o_b"].astype(jnp.float32)
        h = _layer_norm(a.astype(cd) + x, lp["attn_ln_scale"], lp["attn_ln_bias"], cfg.layer_norm_eps)
        ff = jnp.einsum("bsd,df->bsf", h, lp["ffn_in_w"].astype(cd), preferred_element_type=jnp.float32) + lp["ffn_in_b"].astype(jnp.float32)
        ff = jax.nn.gelu(ff, approximate=False).astype(cd)
        ff = jnp.einsum("bsf,fd->bsd", ff, lp["ffn_out_w"].astype(cd), preferred_element_type=jnp.float32) + lp["ffn_out_b"].astype(jnp.float32)
        h = _layer_norm(ff.astype(cd) + h, lp["ffn_ln_scale"], lp["ffn_ln_bias"], cfg.layer_norm_eps)
        return h, None
    h, _ = jax.lax.scan(body, h, p["layers"], unroll=unroll)
    cls = h[:, 0, :].astype(jnp.float32)
    return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12)

batches = [jnp.asarray(r.integers(0, 30000, (B, S)), jnp.int32) for _ in range(40)]
for unroll in (12,):
    @jax.jit
    def step(acc, p, ids, unroll=unroll):
        e = fwd(p, ids, unroll)
        return acc + jnp.sum(e), e
    acc, e = step(jnp.zeros(()), params, batches[0]); np.asarray(e)
    acc = jnp.zeros(()); t0 = time.perf_counter()
    for i in range(40):
        acc, e = step(acc, params, batches[i])
    float(acc); dt = time.perf_counter() - t0
    print(f"unroll={unroll}: {B*40/dt:.0f} q/s ({dt/40*1000:.1f} ms/batch)")
