"""Weight-stationary int8 projection kernels — the attention-side analogs
of the fused FFN block (ops/ffn_int8.py).

Two kernels complete the encoder layer's int8 story:

- ``quant_matmul_int8`` — dynamic per-row activation quantization + one
  int8×int8→int32 MXU matmul + f32 scale/bias epilogue, all in VMEM.  Used
  for the fused QKV projection ``[M, D] @ [D, 3D]``: XLA's lowering of the
  same computation materializes the quantized activations and the int32
  accumulator in HBM between fusions; here they never leave VMEM.
- ``proj_residual_ln_int8`` — the attention output projection fused with
  its residual add + LayerNorm epilogue: ``LN(x @ Wo + b + res)``.  Same
  weight-stationary layout; the projection result never round-trips HBM
  before the normalization that immediately consumes it.

Weights use the per-output-channel symmetric int8 scheme from
``quantization.py`` / ``models/encoder_int8.quantize_weight``.

Reference analog: the INT8 dynamic-quantized ONNX path (reference
classifier.py:1031-1107) — these kernels are its TPU-native form for the
third of encoder FLOPs the FFN kernel does not cover.
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


def _quant_rows(h):
    """Per-row symmetric int8: → (int8 rows, f32 row scale [TM, 1])."""
    absmax = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True), 1e-8)
    scale = absmax * (1.0 / 127.0)
    q = jnp.clip(jnp.round(h / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _matmul_kernel(x_ref, w_ref, s_ref, b_ref, out_ref):
    h = x_ref[:].astype(jnp.float32)                       # [TM, D]
    x_q, x_scale = _quant_rows(h)
    acc = jax.lax.dot_general(
        x_q, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # [TM, N] int32
    out_ref[:] = (acc.astype(jnp.float32) * x_scale * s_ref[:]
                  + b_ref[:]).astype(out_ref.dtype)


def _proj_ln_kernel(x_ref, w_ref, s_ref, b_ref, res_ref, g_ref, beta_ref,
                    eps_ref, out_ref):
    h = x_ref[:].astype(jnp.float32)                       # [TM, D]
    x_q, x_scale = _quant_rows(h)
    acc = jax.lax.dot_general(
        x_q, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * s_ref[:] + b_ref[:]
    y = y + res_ref[:].astype(jnp.float32)
    mean = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=1, keepdims=True)
    normed = (y - mean) * jax.lax.rsqrt(var + eps_ref[0])
    out_ref[:] = (normed * g_ref[:] + beta_ref[:]).astype(out_ref.dtype)


def _row(v):
    return v.reshape(1, -1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_m",))
def quant_matmul_int8(
    x: jax.Array,        # [M, D]
    w_q: jax.Array,      # [D, N] int8
    s: jax.Array,        # [N] f32 per-output-channel scales
    b: jax.Array,        # [N]
    tile_m: int = 256,
) -> jax.Array:
    """→ ``(quantize_rows(x) @ w_q) · scales + b`` in x.dtype, [M, N]."""
    M, D = x.shape
    N = w_q.shape[1]
    if M % tile_m != 0:
        Mp = ((M + tile_m - 1) // tile_m) * tile_m
        xp = jnp.zeros((Mp, D), x.dtype).at[:M].set(x)
        return quant_matmul_int8(xp, w_q, s, b, tile_m=tile_m)[:M]
    return pl.pallas_call(
        _matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * N,
            bytes_accessed=M * D * 2 + D * N + M * N * 2,
            transcendentals=0,
        ),
    )(x, w_q, _row(s), _row(b))


@functools.partial(jax.jit, static_argnames=("tile_m",))
def proj_residual_ln_int8(
    x: jax.Array,        # [M, D] projection input (attention context)
    w_q: jax.Array,      # [D, D] int8
    s: jax.Array,        # [D]
    b: jax.Array,        # [D]
    res: jax.Array,      # [M, D] residual stream
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    eps,
    tile_m: int = 256,
) -> jax.Array:
    """→ ``LayerNorm(x @ Wo + b + res)`` in x.dtype, [M, D]."""
    M, D = x.shape
    if M % tile_m != 0:
        Mp = ((M + tile_m - 1) // tile_m) * tile_m
        xp = jnp.zeros((Mp, D), x.dtype).at[:M].set(x)
        rp = jnp.zeros((Mp, D), res.dtype).at[:M].set(res)
        return proj_residual_ln_int8(xp, w_q, s, b, rp, ln_scale, ln_bias,
                                     eps, tile_m=tile_m)[:M]
    eps_arr = jnp.asarray([eps], jnp.float32)
    return pl.pallas_call(
        _proj_ln_kernel,
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * D + 8 * M * D,
            bytes_accessed=M * D * 2 * 3 + D * D,
            transcendentals=0,
        ),
    )(x, w_q, _row(s), _row(b), res, _row(ln_scale), _row(ln_bias), eps_arr)


def quant_matmul_ref(x, w, b):
    """Float oracle for ``quant_matmul_int8`` (exact-math reference)."""
    return (x.astype(jnp.float32) @ w.astype(jnp.float32) + b)


def proj_residual_ln_ref(x, w, b, res, ln_scale, ln_bias, eps):
    """Float oracle for ``proj_residual_ln_int8``."""
    y = x.astype(jnp.float32) @ w.astype(jnp.float32) + b \
        + res.astype(jnp.float32)
    mean = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=1, keepdims=True)
    return (y - mean) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
