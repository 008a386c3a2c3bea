"""Inference benchmark — latency/throughput across batch sizes and dtypes.

Reference analog: scripts/benchmark_onnx.py / benchmark_onnx_speedup.py
(PyTorch vs ONNX vs quantized-ONNX CPU latency).  On TPU the comparison is
f32 vs bf16 compute for the jitted pipeline, with per-stage timers
(tokenize / embed / kNN+fusion) from the profiling module.

Usage:
    python scripts/benchmark_inference.py --model bert-base-uncased \
        --batch-sizes 1 8 32 128 --iters 20
"""

import argparse
import json
import time

import numpy as np


def run(model_name: str, batch_sizes, iters: int, seq_len: int):
    import jax
    import jax.numpy as jnp

    from adaptive_classifier_tpu.models.encoder import Encoder, embed_texts_device
    from adaptive_classifier_tpu.models import head as head_lib
    from adaptive_classifier_tpu.ops import knn, fusion
    from adaptive_classifier_tpu.utils.profiling import StageTimers

    results = {}
    for dtype in ("bfloat16", "float32"):
        enc = Encoder(model_name, compute_dtype=dtype)
        cfg = enc.config
        C_cap, n_active, k = 32, 10, 5
        head_params = head_lib.init_head(
            jax.random.PRNGKey(42), cfg.hidden_size, C_cap, n_active,
            hidden_dims=[cfg.hidden_size, cfg.hidden_size // 2],
        )
        r = np.random.default_rng(0)
        protos = jnp.asarray(r.standard_normal((C_cap, cfg.hidden_size)), jnp.float32)
        protos = protos / jnp.linalg.norm(protos, axis=1, keepdims=True)
        valid = jnp.arange(C_cap) < n_active
        pw = jnp.full((C_cap,), 0.7)
        hw = jnp.full((C_cap,), 0.3)
        cd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

        @jax.jit
        def pipeline(ep, hp, ids, mask):
            emb = embed_texts_device(ep, ids, mask, cfg, cd)
            sims = knn.masked_sims(emb, protos, valid)
            logits = head_lib.head_forward(hp, emb, train=False)
            return fusion.fuse_full(sims, logits, valid, valid, pw, hw, k, True)

        for B in batch_sizes:
            ids = jnp.asarray(r.integers(0, min(cfg.vocab_size, 8000), (B, seq_len)), jnp.int32)
            mask = jnp.ones((B, seq_len), jnp.int32)
            s, _ = pipeline(enc.params, head_params, ids, mask)
            s.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                s, _ = pipeline(enc.params, head_params, ids, mask)
            s.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            results[f"{dtype}/B{B}"] = {
                "latency_ms": round(dt * 1000, 3),
                "ms_per_query": round(dt * 1000 / B, 4),
                "qps": round(B / dt, 1),
            }
            print(f"{dtype:9s} B={B:<4d} {dt*1000:8.2f} ms/batch "
                  f"{dt*1000/B:8.3f} ms/query {B/dt:10.1f} q/s")

    # host tokenization throughput (the input-pipeline bound)
    from adaptive_classifier_tpu.models.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.hermetic()
    rows = {
        "ascii": "the quick brown fox jumps over the lazy dog again and again",
        "unicode": "café déjà-vu naïve façade Zürich coöperate straße søster",
    }
    results["tokenizer"] = {}
    for name, row in rows.items():
        texts = [row] * 1024
        tok(texts[:8], max_length=128)  # warm native build/handle
        t0 = time.perf_counter()
        tok(texts, max_length=128)
        dt = time.perf_counter() - t0
        results["tokenizer"][f"{name}_texts_per_sec"] = round(1024 / dt, 1)
        print(f"tokenizer[{name}]: {1024/dt:.0f} texts/s "
              f"({'native' if tok._get_native() else 'python'} path)")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bert-base-uncased")
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8, 32, 128])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    res = run(args.model, args.batch_sizes, args.iters, args.seq_len)
    if args.json:
        print(json.dumps(res))
