"""Fused residual-add + LayerNorm Pallas kernel.

Device-trace profiling of the encoder (B=256, S=64, bert-base, v5e) shows
the f32 convert+reduce fusions around LayerNorm at ~46% of step time — the
bf16 residual stream is upcast, mean/var-reduced, normalized, and downcast
through HBM four times per layer.  This kernel does the whole epilogue in
one VMEM pass: load the bf16 activation + residual tiles once, accumulate
statistics in f32 on the VPU, write the normalized bf16 output once.

Parity vs the jnp reference (`models/encoder._layer_norm`) is tested in
interpreter mode.

**Measured outcome (v5e, bert-base, B=256, S=64): end-to-end 6555 q/s with
this kernel vs 6837 q/s with XLA's own fusion — the kernel is ~4% slower.**
The traced convert+reduce cost is intrinsic VPU work that XLA already fuses
optimally, and the pallas_call boundary prevents fusing the preceding
bias-add into the same epilogue.  The kernel is therefore OFF by default
(encoder passes ``use_pallas=False``) and kept as a parity-tested building
block and a recorded experiment — same lesson as flash attention at ≤512
tokens: don't hand-schedule what the compiler already schedules.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _add_ln_kernel(x_ref, r_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    s = x_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)  # [T, D]
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=-1, keepdims=True)
    y = (s - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "tile"))
def add_layer_norm_pallas(
    x: jax.Array,       # [R, D] (row-flattened activations)
    resid: jax.Array,   # [R, D]
    scale: jax.Array,   # [D]
    bias: jax.Array,    # [D]
    eps: float = 1e-12,
    tile: int = 256,
) -> jax.Array:
    R, D = x.shape
    assert R % tile == 0, (R, tile)
    kernel = functools.partial(_add_ln_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, D), x.dtype),
        grid=(R // tile,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * R * D, bytes_accessed=2 * R * D * 3 + 2 * D * 4,
            transcendentals=R,
        ),
    )(x, resid, scale[None, :], bias[None, :])


def add_layer_norm(
    x: jax.Array,       # [B, S, D]
    resid: jax.Array,   # [B, S, D]
    scale: jax.Array,
    bias: jax.Array,
    eps: float,
    use_pallas: bool,
) -> jax.Array:
    """Fused ``LayerNorm(x + resid)`` → same dtype as ``x``."""
    if not use_pallas or not _HAS_PALLAS:
        s32 = x.astype(jnp.float32) + resid.astype(jnp.float32)
        mean = jnp.mean(s32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(s32 - mean), axis=-1, keepdims=True)
        y = (s32 - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)
    B, S, D = x.shape
    R = B * S
    tile = 256 if R % 256 == 0 else (8 if R % 8 == 0 else 1)
    y = add_layer_norm_pallas(
        x.reshape(R, D), resid.reshape(R, D), scale, bias, eps=eps, tile=tile
    )
    return y.reshape(B, S, D)
