"""MFU / roofline measurement for the default int8 encoder path.

Round-3 task (VERDICT.md #5): re-measure MXU utilization on the int8
default path (the round-1 ~37% figure predates the fused int8 kernels) and
name the top remaining stall sources from measurement, not guesswork.

Method: pipelined end-to-end timing of ``embed_texts_device_int8`` at
B=256/S=64 (the serving shape behind the 8.1k q/s headline), an analytic
FLOP ledger per op class (int8 GEMMs vs bf16 attention matmuls vs VPU
work), and component ablation — each block timed standalone at identical
shapes — to attribute the gap.  Optionally writes a ``jax.profiler`` trace
for inspection.

    python run_script.py mfu_roofline [--batch 256] [--seq 64]
        [--trace /tmp/mfu_trace] [--json-out MFU.json]

v5e peaks used: 197 TFLOP/s bf16, 394 TOP/s int8, 819 GB/s HBM
(public TPU v5e specs; the "How to Scale Your Model" roofline method).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_classifier_tpu.models.encoder import (
    EncoderConfig, init_params_on_device,
)
from adaptive_classifier_tpu.models.encoder_int8 import (
    embed_texts_device_int8, quantize_encoder_for_inference,
)

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
PEAK_HBM = 819e9


def timed(fn, *args, iters=30):
    # chain a scalar through every step: on the tunneled backend, blocking
    # on the last of N independent dispatches does NOT wait for the earlier
    # ones (measured ~50× under-reads; same fix as ab_attention.py)
    def total(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in leaves)

    acc = jnp.zeros(()) + total(fn(*args))
    float(acc)                                   # compile + settle
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + total(fn(*args))
    float(acc)
    return (time.perf_counter() - t0) / iters


def flop_ledger(cfg: EncoderConfig, B: int, S: int):
    """MACs by op class for one forward (whole batch)."""
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    tokens = B * S
    int8_macs = L * tokens * (D * 3 * D + D * D + 2 * D * F)  # qkv + o + ffn
    attn_macs = L * B * cfg.num_heads * S * S * cfg.head_dim * 2  # scores + pv
    return {"int8_macs": int8_macs, "attn_bf16_macs": attn_macs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace of 5 steps")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--attn-impl", default="fusedqkv",
                    choices=["fusedqkv", "einsum", "oneshot", "flash"],
                    help="attention path to measure; the shipped policy "
                         "for S<1024 is the packed-QKV Pallas kernel "
                         "(Encoder._attn_impl, adopted round 3)")
    ap.add_argument("--fuse-o-proj", default="auto",
                    choices=["auto", "on", "off"],
                    help="fold the O-projection + both LayerNorms into the "
                         "FFN Pallas program (ops/ffn_int8.attn_ffn_block_"
                         "int8, round-5 MFU candidate); 'auto' follows the "
                         "encoder default")
    args = ap.parse_args()
    fuse_o = {"auto": None, "on": True, "off": False}[args.fuse_o_proj]

    cfg = EncoderConfig(vocab_size=30522)   # bert-base dims
    params = init_params_on_device(0, cfg)
    qparams = jax.jit(quantize_encoder_for_inference)(params)
    r = np.random.default_rng(0)
    B, S = args.batch, args.seq
    ids = jnp.asarray(r.integers(0, 30000, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)

    embed = jax.jit(lambda p, i, m: embed_texts_device_int8(
        p, i, m, cfg, jnp.bfloat16, attn_impl=args.attn_impl,
        fuse_o_proj=fuse_o))
    dt = timed(embed, qparams, ids, mask, iters=args.iters)

    led = flop_ledger(cfg, B, S)
    t_int8_ideal = 2 * led["int8_macs"] / PEAK_INT8
    t_attn_ideal = 2 * led["attn_bf16_macs"] / PEAK_BF16
    # weight traffic is the dominant HBM stream at small B·S: int8 weights
    # read once per forward (scan keeps layers in HBM)
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    w_bytes = L * (D * 3 * D + D * D + 2 * D * F) + cfg.vocab_size * D * 4
    t_hbm_ideal = w_bytes / PEAK_HBM

    # effective utilization: achieved matmul throughput vs mixed peak
    t_ideal = t_int8_ideal + t_attn_ideal
    mxu_util = t_ideal / dt

    # ---- component ablation at identical shapes -----------------------
    import contextlib

    from adaptive_classifier_tpu.ops.ffn_int8 import ffn_block_int8
    from adaptive_classifier_tpu.ops.matmul_int8 import quant_matmul_int8

    ablation_ctx = contextlib.nullcontext()
    if jax.default_backend() != "tpu":
        # CPU smoke mode: Pallas building blocks only run interpreted
        from jax.experimental.pallas import tpu as pltpu

        ablation_ctx = pltpu.force_tpu_interpret_mode()
    ablation_ctx.__enter__()

    x = jnp.asarray(r.standard_normal((B * S, D)), jnp.bfloat16)
    lp = jax.tree_util.tree_map(lambda a: a, qparams["layers"])
    take0 = jax.jit(lambda t: jax.tree_util.tree_map(lambda a: a[0], t))
    l0 = take0(lp)

    t_qkv = timed(jax.jit(lambda x, l: quant_matmul_int8(
        x, l["qkv_w.int8"], l["qkv_w.scale"], l["qkv_b"])), x, l0,
        iters=args.iters)
    t_ffn = timed(jax.jit(lambda x, l: ffn_block_int8(
        x, l["ffn_in_w.int8"], l["ffn_in_w.scale"], l["ffn_in_b"],
        l["ffn_out_w.int8"], l["ffn_out_w.scale"], l["ffn_out_b"],
        l["ffn_ln_scale"], l["ffn_ln_bias"], cfg.layer_norm_eps)), x, l0,
        iters=args.iters)

    H, Dh = cfg.num_heads, cfg.head_dim
    q = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.bfloat16)

    def attn(q):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, q,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bkhd->bqhd", p, q,
                          preferred_element_type=jnp.float32)

    t_attn = timed(jax.jit(attn), q, iters=args.iters)
    t_oproj = timed(jax.jit(lambda x, l: quant_matmul_int8(
        x, l["o_w.int8"], l["o_w.scale"], l["o_b"])), x, l0,
        iters=args.iters)

    # round-5 candidate: the whole post-attention layer body as ONE program
    # (int8 o_proj + residual+LN + both FFN matmuls + residual+LN)
    from adaptive_classifier_tpu.ops.ffn_int8 import attn_ffn_block_int8

    t_attn_ffn = timed(jax.jit(lambda c, x, l: attn_ffn_block_int8(
        c, x, l["o_w.int8"], l["o_w.scale"], l["o_b"],
        l["attn_ln_scale"], l["attn_ln_bias"],
        l["ffn_in_w.int8"], l["ffn_in_w.scale"], l["ffn_in_b"],
        l["ffn_out_w.int8"], l["ffn_out_w.scale"], l["ffn_out_b"],
        l["ffn_ln_scale"], l["ffn_ln_bias"], cfg.layer_norm_eps)),
        x, x, l0, iters=args.iters)

    # the shipped attention: packed-QKV Pallas kernel straight off the
    # projection's natural [B, S, 3D] layout (ops/attention_qkv.py)
    from adaptive_classifier_tpu.ops.attention_qkv import attention_from_qkv

    qkv = jnp.asarray(r.standard_normal((B, S, 3 * D)), jnp.bfloat16)
    t_attn_fused = timed(
        jax.jit(lambda qkv, m: attention_from_qkv(qkv, m, H, Dh)), qkv,
        mask, iters=args.iters)
    ablation_ctx.__exit__(None, None, None)

    report = {
        "shape": {"B": B, "S": S, "dims": "bert-base"},
        "backend": jax.default_backend(),
        "attn_impl": args.attn_impl,
        "fuse_o_proj": args.fuse_o_proj,
        "ms_per_forward": round(dt * 1e3, 3),
        "q_per_s_device_only": round(B / dt, 1),
        "flops": {k: int(v) for k, v in led.items()},
        "ideal_ms": {"int8_gemms": round(t_int8_ideal * 1e3, 3),
                     "attn_bf16": round(t_attn_ideal * 1e3, 3),
                     "weight_hbm": round(t_hbm_ideal * 1e3, 3)},
        "mxu_utilization": round(mxu_util, 3),
        "ablation_ms_per_layer": {
            "qkv_int8": round(t_qkv * 1e3, 3),
            "o_proj_int8": round(t_oproj * 1e3, 3),
            "ffn_int8_fused": round(t_ffn * 1e3, 3),
            "attn_ffn_int8_megakernel": round(t_attn_ffn * 1e3, 3),
            "attention_bf16_einsum": round(t_attn * 1e3, 3),
            "attention_fusedqkv": round(t_attn_fused * 1e3, 3),
        },
        # standalone parts × L vs the whole forward: the difference is
        # embedding lookup/LN/pooling plus (negative) cross-op overlap
        # (uses the attention variant actually measured end-to-end)
        "ablation_sum_ms": round(
            (t_qkv + t_oproj + t_ffn
             + (t_attn_fused if args.attn_impl == "fusedqkv" else t_attn))
            * cfg.num_layers * 1e3, 3),
    }
    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                out = embed(qparams, ids, mask)
            out.block_until_ready()
        report["trace_dir"] = args.trace
    print(json.dumps(report, indent=2))
    if args.json_out:
        from pathlib import Path

        Path(args.json_out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
