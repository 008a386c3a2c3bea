"""kNN index throughput — device (Pallas/XLA) vs native CPU flat index.

The north-star kNN story (BASELINE.md): exact-kNN recall parity with flat
search at equal memory, with the HBM-resident index searched at MXU speed.
This measures queries/sec across index sizes on the device path (jnp ref or
Pallas kernel, auto-dispatched) and on the native C++ flat index (the
FAISS-IndexFlatL2 analog), and verifies recall@10 parity between them.

Usage:
    python scripts/benchmark_knn.py --sizes 1024 8192 65536 --dim 768 --batch 256
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1024, 8192, 65536])
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adaptive_classifier_tpu.ops import knn, knn_topk
    from adaptive_classifier_tpu import native

    r = np.random.default_rng(0)
    report = {}
    for C in args.sizes:
        protos = r.standard_normal((C, args.dim)).astype(np.float32)
        protos /= np.linalg.norm(protos, axis=1, keepdims=True)
        q = r.standard_normal((args.batch, args.dim)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        valid = np.ones(C, bool)

        pj, qj, vj = jnp.asarray(protos), jnp.asarray(q), jnp.asarray(valid)

        @jax.jit
        def search(qq):
            sims = knn.masked_sims(qq, pj, vj, pallas_min_classes=512)
            return knn.topk_scores(sims, vj, args.k)

        s, idx = search(qj)
        s.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, idx = search(qj)
        s.block_until_ready()
        dev_qps = args.batch * args.iters / (time.perf_counter() - t0)

        entry = {"device_qps": round(dev_qps, 1)}

        # two-stage fused top-k (no [B, C] materialization) — the
        # large-index path (ops/knn_topk.py)
        @jax.jit
        def search_fused(qq):
            return knn_topk.topk_scores_fused(qq, pj, vj, args.k)

        sf, idxf = search_fused(qj)
        sf.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            sf, idxf = search_fused(qj)
        sf.block_until_ready()
        entry["fused_topk_qps"] = round(
            args.batch * args.iters / (time.perf_counter() - t0), 1)
        entry["fused_idx_match"] = bool(
            np.array_equal(np.asarray(idxf), np.asarray(idx)))

        if native.native_available():
            fi = native.FlatIndexL2(args.dim)
            fi.add(protos)
            fi.search(q[:8], args.k)  # warm
            t0 = time.perf_counter()
            _, ids_native = fi.search(q, args.k)
            host_qps = args.batch / (time.perf_counter() - t0)
            entry["native_cpu_qps"] = round(host_qps, 1)
            entry["speedup"] = round(dev_qps / host_qps, 1)
            # recall@k parity (exact == exact)
            idx_np = np.asarray(idx)
            recall = np.mean([
                len(set(idx_np[b]) & set(ids_native[b])) / args.k
                for b in range(args.batch)
            ])
            entry["recall_at_k_vs_flat"] = round(float(recall), 4)

        report[f"C={C}"] = entry
        print(f"C={C:<7d} " + "  ".join(f"{k}={v}" for k, v in entry.items()))

    print(json.dumps(report))


if __name__ == "__main__":
    main()
