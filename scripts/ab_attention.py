"""Attention-implementation A/B: einsum vs one-shot Pallas vs flash Pallas.

Round-3 task (VERDICT.md #4): the reference's default regime is
max_length=512 (reference models.py:112); round 2 measured the streaming
flash kernel losing to XLA's einsum there (154 vs 108 ms at S=512/B=64).
This harness times the END-TO-END encoder embed (int8 and bf16 paths) at
S ∈ {64, 128, 512} for each attention implementation, with pipelined
dispatch (N dispatches, one block) so the ~0.1 s tunnel RTT doesn't
dominate.  Run on real TPU:

    python run_script.py ab_attention [--batch 32] [--iters 20]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_classifier_tpu.models.encoder import (
    EncoderConfig, embed_texts_device, init_params_on_device,
)
from adaptive_classifier_tpu.models.encoder_int8 import (
    embed_texts_device_int8, quantize_encoder_for_inference,
)


def time_impl(embed_fn, params, batches, mask, iters):
    import contextlib

    ctx = contextlib.nullcontext()
    if jax.default_backend() != "tpu":
        # CPU smoke-test mode: Pallas only runs interpreted off-TPU
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    with ctx:
        # chain a scalar accumulator through every step: on the tunneled
        # backend, blocking on only the last independent output does NOT
        # wait for the earlier dispatches (measured: 50× too-fast numbers);
        # the dependency chain forces every forward into the timed window
        # (same pattern as ab_fused_qkv.py)
        acc = jnp.zeros(())
        acc = acc + jnp.sum(embed_fn(params, batches[0], mask))
        float(acc)                               # compile + settle
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for i in range(iters):
            acc = acc + jnp.sum(embed_fn(params, batches[i % len(batches)], mask))
        float(acc)
        return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seqs", default="64,128,512")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    cfg = EncoderConfig(vocab_size=30522)        # bert-base dims
    params = init_params_on_device(0, cfg)
    qparams = jax.jit(quantize_encoder_for_inference)(params)
    r = np.random.default_rng(0)
    B = args.batch
    report = {"batch": B, "iters": args.iters, "backend": jax.default_backend(),
              "dims": "bert-base 12L/768H/12heads/Dh64", "rows": []}

    for S in [int(s) for s in args.seqs.split(",")]:
        batches = [jnp.asarray(r.integers(0, 30000, (B, S)), jnp.int32)
                   for _ in range(8)]
        mask = jnp.ones((B, S), jnp.int32)
        for path in ("int8", "bf16"):
            for impl in ("einsum", "fusedqkv", "oneshot", "flash"):
                if path == "int8":
                    fn = jax.jit(lambda p, ids, m, impl=impl: embed_texts_device_int8(
                        p, ids, m, cfg, jnp.bfloat16, attn_impl=impl))
                    p = qparams
                else:
                    fn = jax.jit(lambda p, ids, m, impl=impl: embed_texts_device(
                        p, ids, m, cfg, jnp.bfloat16, attn_impl=impl))
                    p = params
                dt = time_impl(fn, p, batches, mask, args.iters)
                row = {"S": S, "path": path, "impl": impl,
                       "ms_per_batch": round(dt * 1e3, 2),
                       "q_per_s": round(B / dt, 1)}
                report["rows"].append(row)
                print(row, flush=True)

    # per (S, path): name the winner
    for S in sorted({r["S"] for r in report["rows"]}):
        for path in ("int8", "bf16"):
            rows = [r for r in report["rows"]
                    if r["S"] == S and r["path"] == path]
            best = min(rows, key=lambda r: r["ms_per_batch"])
            print(f"S={S} {path}: winner {best['impl']} "
                  f"({best['ms_per_batch']} ms)")
    if args.json_out:
        from pathlib import Path

        Path(args.json_out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
