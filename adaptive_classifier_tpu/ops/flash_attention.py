"""Flash attention — Pallas kernel for the encoder's attention hot op.

The reference's encoder attention materializes the full ``[B, H, S, S]``
probability tensor in memory (torch SDPA inside HF BERT).  For the 512-token
regime (SURVEY.md §5: sequences are hard-capped at max_length=512) the
HBM-bandwidth win comes from never writing those logits: this kernel streams
K/V tiles through VMEM with the online-softmax recurrence, accumulating the
output in float32 while the two matmuls ride the MXU in bf16.

Layout: grid over (batch, head, query-tile); K/V for one head stay resident
in VMEM (S ≤ 512 ⇒ ≤128 KB), query tiles of 128 rows stream through.

A jnp reference (the einsum path in models/encoder.py) backs parity tests
via the Pallas interpreter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, k_tile: int):
    # q_ref [1,1,TQ,Dh]; k_ref/v_ref [1,1,S,Dh]; mask_ref [1,1,S]; o_ref [1,1,TQ,Dh]
    q = q_ref[0, 0]                       # [TQ, Dh] bf16/f32
    TQ, Dh = q.shape
    S = k_ref.shape[2]
    n_tiles = S // k_tile

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(i * k_tile, k_tile), :]          # [TK, Dh]
        v = v_ref[0, 0, pl.ds(i * k_tile, k_tile), :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                              # [TQ, TK] f32
        s = s + mask_ref[0, 0, pl.ds(i * k_tile, k_tile)][None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)                                 # [TQ, TK]
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((TQ, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((TQ, 1), jnp.float32)
    a0 = jnp.zeros((TQ, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_tiles, body, (m0, l0, a0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "k_tile"))
def flash_attention_padded(
    q: jax.Array,          # [B, H, S, Dh], S multiple of tiles
    k: jax.Array,
    v: jax.Array,
    mask_bias: jax.Array,  # [B, 1, S] float32 additive (0 valid / -1e9 masked)
    q_tile: int = 128,
    k_tile: int = 128,
) -> jax.Array:
    B, H, S, Dh = q.shape
    assert S % q_tile == 0 and S % k_tile == 0, (S, q_tile, k_tile)
    scale = 1.0 / float(np.sqrt(Dh))
    grid = (B, H, S // q_tile)
    kernel = functools.partial(_flash_kernel, scale=scale, k_tile=k_tile)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, q_tile, Dh), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, q_tile, Dh), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * Dh,
            bytes_accessed=2 * B * H * S * Dh * 3 + 2 * B * H * S * Dh,
            transcendentals=B * H * S * S,
        ),
    )(q, k, v, mask_bias)


def _oneshot_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """Whole-head attention in one VMEM pass — the S ≤ 512 regime.

    At 512 tokens the score matrix for one head is [512, 512] f32 = 1 MB,
    so the online-softmax recurrence of ``_flash_kernel`` is pure overhead:
    scores fit in VMEM outright.  One program = one (batch, head): two large
    MXU matmuls with a plain row softmax between them, nothing written to
    HBM but the [S, Dh] output.  Replaces the reference's torch SDPA
    (reference models.py attention path) for the max_length=512 default
    regime (reference models.py:112)."""
    q = q_ref[0, 0]                       # [Sp, Dhp]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                             # [Sp, Sp] f32
    s = s + mask_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / jnp.maximum(l, 1e-30)).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@jax.jit
def oneshot_attention_padded(
    q: jax.Array,          # [B, H, Sp, Dhp]
    k: jax.Array,
    v: jax.Array,
    mask_bias: jax.Array,  # [B, 1, Sp] float32 additive
) -> jax.Array:
    B, H, S, Dh = q.shape
    scale = 1.0 / float(np.sqrt(Dh))
    return pl.pallas_call(
        functools.partial(_oneshot_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * Dh,
            bytes_accessed=2 * B * H * S * Dh * 4,
            transcendentals=B * H * S * S,
        ),
    )(q, k, v, mask_bias)


def oneshot_attention(
    q: jax.Array,          # [B, S, H, Dh] (encoder layout)
    k: jax.Array,
    v: jax.Array,
    attention_mask: jax.Array,  # [B, S] 1/0
) -> jax.Array:
    """Pad to (8, 128) tile multiples, run one-shot attention, un-pad."""
    B, S, H, Dh = q.shape
    Sp = _round_up(S, 128 if S >= 128 else 8)
    Dhp = _round_up(Dh, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0), (0, Dhp - Dh)))

    qp = pad(q).transpose(0, 2, 1, 3)   # [B, H, Sp, Dhp]
    kp = pad(k).transpose(0, 2, 1, 3)
    vp = pad(v).transpose(0, 2, 1, 3)
    bias = jnp.where(
        jnp.pad(attention_mask, ((0, 0), (0, Sp - S))) > 0, 0.0, NEG
    ).astype(jnp.float32)[:, None, :]
    # kernel scales by 1/sqrt(padded Dh); pre-scale q to logits/sqrt(true Dh)
    if Dhp != Dh:
        qp = qp * jnp.asarray(np.sqrt(Dhp / Dh), qp.dtype)
    out = oneshot_attention_padded(qp, kp, vp, bias)
    return out.transpose(0, 2, 1, 3)[:, :S, :, :Dh]


def flash_attention(
    q: jax.Array,          # [B, S, H, Dh] (encoder layout)
    k: jax.Array,
    v: jax.Array,
    attention_mask: jax.Array,  # [B, S] 1/0
) -> jax.Array:
    """Pad to tile multiples, run the kernel, return [B, S, H, Dh]."""
    B, S, H, Dh = q.shape
    tile = 128 if S >= 128 else _round_up(S, 8)
    Sp = _round_up(S, tile)
    Dhp = _round_up(Dh, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0), (0, Dhp - Dh)))

    qp = pad(q).transpose(0, 2, 1, 3)   # [B, H, Sp, Dhp]
    kp = pad(k).transpose(0, 2, 1, 3)
    vp = pad(v).transpose(0, 2, 1, 3)
    bias = jnp.where(
        jnp.pad(attention_mask, ((0, 0), (0, Sp - S))) > 0, 0.0, NEG
    ).astype(jnp.float32)[:, None, :]                 # [B, 1, Sp]
    # the kernel scales by 1/sqrt(padded Dh); pre-scale q so softmax sees
    # logits/sqrt(true Dh)
    if Dhp != Dh:
        qp = qp * jnp.asarray(np.sqrt(Dhp / Dh), qp.dtype)
    out = flash_attention_padded(qp, kp, vp, bias, q_tile=tile, k_tile=tile)
    return out.transpose(0, 2, 1, 3)[:, :S, :, :Dh]
