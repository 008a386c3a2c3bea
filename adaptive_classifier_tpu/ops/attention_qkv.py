"""Fused attention over the packed QKV projection output.

Round-3 trace finding (docs/architecture.md, MFU table): at B=256/S=64 the
einsum attention region costs ~13 ms/forward — 0.2 ms of ideal matmul work
wrapped in layout copies (the `[B,S,H,Dh]` head split forces physical
permutes between the QKV custom call's row-major output and the einsum's
preferred layout) and VPU loop fusions (XLA lowers the small per-head
`[S,S]` score/ctx products off the MXU).  The reference hits the same op
through torch SDPA over split heads (reference models.py attention path);
on TPU the right shape for this regime is different:

This kernel consumes the QKV projection's NATURAL output — one
``[B, S, 3·D]`` row-major tensor, exactly what ``quant_matmul_int8`` /
the fused bf16 QKV matmul produce — and emits the O-projection's natural
input ``[B, S, D]``.  No `[B,S,H,Dh]` tensor ever exists in HBM; the head
split happens in VMEM as 128-aligned column slices.  Heads are processed
in PAIRS (Dh=64 ⇒ a pair is one 128-lane register row): the pair's Q/K/V
rows are stacked to ``[2S, Dh]`` and attention runs as ONE
``[2S,2S]``-score matmul with a block-diagonal mask — 2× the useful MACs
(the Dh=64-on-128-lanes information floor, see docs/architecture.md
attention A/B) but MXU-shaped and free of cross-head reduction.

Odd head counts fall back to a per-head tail; any ``head_dim ≤ 128`` with
``head_dim % 8 == 0`` is supported via the per-head path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _softmax_rows(s: jax.Array) -> jax.Array:
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p / jnp.maximum(l, 1e-30)


def _kernel(qkv_ref, bias_ref, o_ref, *, H: int, Dh: int, D: int,
            scale: float):
    """qkv_ref [NB, S, 3D]; bias_ref [1, NB, S] f32 additive;
    o_ref [NB, S, D]."""
    NB, S, _ = qkv_ref.shape
    pairs, tail = divmod(H, 2)
    # lane masks selecting each half of a head pair's 2·Dh=128 columns
    # (Mosaic can't concatenate lane-offset slices, so instead of stacking
    # the pair to [2S, Dh] the per-head contraction is expressed as a
    # full-width [·,2Dh] dot against the OTHER half zeroed — same 2× MAC
    # waste as any Dh=64-on-128-lanes packing, but every operand is a
    # lane-aligned tile and both products ride the MXU)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 2 * Dh), 1)
    sel_lo = (lane < Dh)
    for b in range(NB):
        bias = bias_ref[0, b, :][None, :]           # [1,S] f32, -1e9 on pads

        for hp in range(pairs):
            lo = 2 * hp * Dh                        # 128-aligned for Dh=64
            qq = qkv_ref[b, :, lo:lo + 2 * Dh]              # [S, 2Dh]
            kk = qkv_ref[b, :, D + lo:D + lo + 2 * Dh]
            vv = qkv_ref[b, :, 2 * D + lo:2 * D + lo + 2 * Dh]
            zero = jnp.zeros((), qq.dtype)
            k_lo = jnp.where(sel_lo, kk, zero)
            k_hi = jnp.where(sel_lo, zero, kk)
            v_lo = jnp.where(sel_lo, vv, zero)
            v_hi = jnp.where(sel_lo, zero, vv)
            dn = (((1,), (1,)), ((), ()))
            s_a = jax.lax.dot_general(                      # q_a·k_aᵀ
                qq, k_lo, dimension_numbers=dn,
                preferred_element_type=jnp.float32) * scale + bias
            s_b = jax.lax.dot_general(                      # q_b·k_bᵀ
                qq, k_hi, dimension_numbers=dn,
                preferred_element_type=jnp.float32) * scale + bias
            p_a = _softmax_rows(s_a).astype(vv.dtype)       # [S, S]
            p_b = _softmax_rows(s_b).astype(vv.dtype)
            dn2 = (((1,), (0,)), ((), ()))
            o_pair = jax.lax.dot_general(                   # cols 0..Dh
                p_a, v_lo, dimension_numbers=dn2,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(                        # cols Dh..2Dh
                p_b, v_hi, dimension_numbers=dn2,
                preferred_element_type=jnp.float32,
            )                                               # [S, 2Dh]
            o_ref[b, :, lo:lo + 2 * Dh] = o_pair.astype(o_ref.dtype)

        if tail:                                    # odd H: last head solo
            lo = 2 * pairs * Dh
            q = qkv_ref[b, :, lo:lo + Dh]
            k = qkv_ref[b, :, D + lo:D + lo + Dh]
            v = qkv_ref[b, :, 2 * D + lo:2 * D + lo + Dh]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias
            p = _softmax_rows(s).astype(v.dtype)
            o = jax.lax.dot_general(
                p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, lo:lo + Dh] = o.astype(o_ref.dtype)


def _kernel_phased(qkv_ref, bias_ref, o_ref, *, H: int, Dh: int, D: int,
                   scale: float):
    """Pair variant with phase-split scheduling: ALL score matmuls are
    emitted first, then every softmax, then all PV matmuls.  The
    interleaved pair kernel alternates MXU (scores) → VPU (softmax) → MXU
    (PV) per head pair, serializing the units on each tiny [S,S] problem;
    emitting the phases separately was meant to let Mosaic overlap pair
    i's softmax with pair i+1's score matmul.  Numerics identical (parity
    test in tests/test_attention_qkv.py).

    REJECTED after the round-5 on-chip A/B: end-to-end int8 encoder
    forward at B=256/S=64 measured 14.84 ms phased vs 13.60 ms pair —
    Mosaic already pipelines the interleaved form, and keeping all 2·NB·H/2
    [S,S] f32 score tiles live raises VMEM/scheduling pressure instead.
    Kept as a tested building block documenting the scheduling experiment
    (same policy as the standalone o_proj kernel, round 2)."""
    NB, S, _ = qkv_ref.shape
    pairs, tail = divmod(H, 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 2 * Dh), 1)
    sel_lo = (lane < Dh)
    dn = (((1,), (1,)), ((), ()))
    dn2 = (((1,), (0,)), ((), ()))
    zero = jnp.zeros((), qkv_ref.dtype)

    scores = []                       # phase 1: every [S,S] score product
    for b in range(NB):
        bias = bias_ref[0, b, :][None, :]
        for hp in range(pairs):
            lo = 2 * hp * Dh
            qq = qkv_ref[b, :, lo:lo + 2 * Dh]
            kk = qkv_ref[b, :, D + lo:D + lo + 2 * Dh]
            k_lo = jnp.where(sel_lo, kk, zero)
            k_hi = jnp.where(sel_lo, zero, kk)
            s_a = jax.lax.dot_general(
                qq, k_lo, dimension_numbers=dn,
                preferred_element_type=jnp.float32) * scale + bias
            s_b = jax.lax.dot_general(
                qq, k_hi, dimension_numbers=dn,
                preferred_element_type=jnp.float32) * scale + bias
            scores.append((s_a, s_b))
        if tail:
            lo = 2 * pairs * Dh
            q = qkv_ref[b, :, lo:lo + Dh]
            k = qkv_ref[b, :, D + lo:D + lo + Dh]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=dn,
                preferred_element_type=jnp.float32) * scale + bias
            scores.append((s, None))

    probs = [(_softmax_rows(a), None if b is None else _softmax_rows(b))
             for a, b in scores]      # phase 2: every softmax (VPU)

    i = 0                             # phase 3: every PV product
    per_b = pairs + (1 if tail else 0)
    for b in range(NB):
        for hp in range(pairs):
            lo = 2 * hp * Dh
            vv = qkv_ref[b, :, 2 * D + lo:2 * D + lo + 2 * Dh]
            v_lo = jnp.where(sel_lo, vv, zero)
            v_hi = jnp.where(sel_lo, zero, vv)
            p_a, p_b = probs[b * per_b + hp]
            o_pair = jax.lax.dot_general(
                p_a.astype(vv.dtype), v_lo, dimension_numbers=dn2,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                p_b.astype(vv.dtype), v_hi, dimension_numbers=dn2,
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, lo:lo + 2 * Dh] = o_pair.astype(o_ref.dtype)
        if tail:
            lo = 2 * pairs * Dh
            v = qkv_ref[b, :, 2 * D + lo:2 * D + lo + Dh]
            p, _ = probs[b * per_b + pairs]
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, dimension_numbers=dn2,
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, lo:lo + Dh] = o.astype(o_ref.dtype)
        i += per_b


def _kernel_perhead(qkv_ref, bias_ref, o_ref, *, H: int, Dh: int, D: int,
                    scale: float):
    """Reference variant: one [S,S] attention per head (sub-lane slices)."""
    NB, S, _ = qkv_ref.shape
    for b in range(NB):
        bias = bias_ref[0, b, :][None, :]
        for h in range(H):
            lo = h * Dh
            q = qkv_ref[b, :, lo:lo + Dh]
            k = qkv_ref[b, :, D + lo:D + lo + Dh]
            v = qkv_ref[b, :, 2 * D + lo:2 * D + lo + Dh]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias
            p = _softmax_rows(s).astype(v.dtype)
            o = jax.lax.dot_general(
                p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, lo:lo + Dh] = o.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "head_dim", "variant"))
def attention_from_qkv(
    qkv: jax.Array,             # [B, S, 3D] packed (q | k | v), row-major
    attention_mask: jax.Array,  # [B, S] 1 valid / 0 pad
    num_heads: int,
    head_dim: int,
    variant: str = "auto",
) -> jax.Array:                 # [B, S, D], dtype of qkv
    """All-heads attention straight off the packed QKV tensor.

    Semantics match the einsum path (keys masked, queries not): softmax
    over ``q·kᵀ/√Dh + mask_bias`` per head, times V.
    """
    B, S, threeD = qkv.shape
    D = num_heads * head_dim
    assert threeD == 3 * D, (threeD, num_heads, head_dim)
    assert S % 8 == 0, f"S={S} must be a multiple of 8"
    if variant == "auto":
        variant = "pair" if (head_dim == 64 and num_heads >= 2) else "perhead"
    kern = {"pair": _kernel, "phased": _kernel_phased,
            "perhead": _kernel_perhead}[variant]

    # pack more batch items per program while blocks stay comfortably in
    # VMEM (a [NB, S, 3D] bf16 block at NB·S = 512 rows is ~2.3 MB at
    # bert-base dims).  Round-5 on-chip A/B of the grid arity: NB 2 → 8
    # (grid 128 → 32 programs) measured 13.68 → 13.60 ms end-to-end int8
    # forward at B=256/S=64 — within noise, kept for the lower dispatch
    # count; the kernel's cost is MXU fill latency on the small per-pair
    # matmuls, not grid overhead (docs/MFU_r05.json ablation).
    NB = 1
    for cand in (8, 4, 2):
        if B % cand == 0 and cand * S <= 512:
            NB = cand
            break
    # [B//NB, NB, S] so the block's trailing two dims equal the array's
    # (the Mosaic block-shape rule: trailing dims divisible by (8, 128) or
    # exactly the array dims)
    bias = jnp.where(attention_mask > 0, 0.0, NEG).astype(
        jnp.float32)
    scale = 1.0 / float(np.sqrt(head_dim))

    flops = 4 * B * num_heads * S * S * head_dim
    if variant in ("pair", "phased"):
        flops *= 2                                   # block-diag waste
    return pl.pallas_call(
        functools.partial(kern, H=num_heads, Dh=head_dim, D=D, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        grid=(B // NB,),
        in_specs=[
            pl.BlockSpec((NB, S, 3 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NB, S, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + B * S * D * qkv.dtype.itemsize,
            transcendentals=B * num_heads * S * S,
        ),
    )(qkv, bias.reshape(B // NB, NB, S))
