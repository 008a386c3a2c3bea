"""Exact kNN over class prototypes — the FAISS ``IndexFlatL2`` replacement.

The reference keeps prototypes in a host-side FAISS flat index and searches it
per query (reference: src/adaptive_classifier/memory.py:34,114).  Here the
prototype matrix is an HBM-resident device array; search is a fused Pallas
kernel (L2 distances on the MXU via the ``‖q‖²+‖p‖²−2qp`` expansion, then the
``exp(−d)`` similarity map and validity masking on the VPU) followed by
top-k + softmax.  Exact distances ⇒ recall parity with FAISS flat is
structural; there is no index build/rebuild step at all — "rebuild"
bookkeeping (memory.py:70-81,161-177) has no equivalent because prototypes are
recomputed as masked means on device.

A jnp reference implementation backs parity tests (the analog of the
reference's ONNX-vs-PyTorch embedding tests, tests/test_onnx_phase1.py:68-96).

Scoring semantics match the reference exactly (memory.py:117-134):
similarity = exp(−d²), then softmax over the k returned neighbors.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas is TPU-only at runtime; imports are safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# jnp reference implementation
# ---------------------------------------------------------------------------

def masked_sims_ref(
    queries: jax.Array,   # [B, D] float32
    protos: jax.Array,    # [C, D] float32
    valid: jax.Array,     # [C] bool
) -> jax.Array:
    """``exp(−‖q−p‖²)`` for valid prototypes, 0 for invalid — [B, C]."""
    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)          # [B, 1]
    pn = jnp.sum(protos * protos, axis=-1)[None, :]                  # [1, C]
    d2 = qn + pn - 2.0 * queries @ protos.T                          # [B, C]
    d2 = jnp.maximum(d2, 0.0)
    return jnp.where(valid[None, :], jnp.exp(-d2), 0.0)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _knn_kernel(q_ref, p_ref, valid_ref, out_ref):
    q = q_ref[:]                                   # [TB, D]
    p = p_ref[:]                                   # [TC, D]
    qn = jnp.sum(q * q, axis=1, keepdims=True)     # [TB, 1]
    pn = jnp.sum(p * p, axis=1, keepdims=True).T   # [1, TC]
    cross = jax.lax.dot_general(
        q, p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [TB, TC]
    d2 = jnp.maximum(qn + pn - 2.0 * cross, 0.0)
    sims = jnp.exp(-d2)
    mask = valid_ref[:] > 0                        # [1, TC]
    out_ref[:] = jnp.where(mask, sims, 0.0)


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_c"))
def masked_sims_pallas(
    queries: jax.Array,   # [B, D] float32 (B, C, D padded to tile multiples)
    protos: jax.Array,    # [C, D] float32
    valid: jax.Array,     # [C] bool
    tile_b: int = 128,
    tile_c: int = 128,
) -> jax.Array:
    """Fused tiled distance+similarity kernel — [B, C] float32.

    Grid tiles over (queries × prototypes); the D contraction rides the MXU
    with float32 accumulation; exp/mask are fused on the VPU so the distance
    matrix never round-trips HBM unscored.
    """
    B, D = queries.shape
    C = protos.shape[0]
    assert B % tile_b == 0 and C % tile_c == 0, (B, C, tile_b, tile_c)
    valid_row = valid.astype(jnp.int32)[None, :]   # [1, C] — TPU wants ≥2D

    grid = (B // tile_b, C // tile_c)
    return pl.pallas_call(
        _knn_kernel,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, tile_c), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * D + 4 * B * C,
            bytes_accessed=4 * (B * D + C * D + B * C),
            transcendentals=B * C,
        ),
    )(queries, protos, valid_row)


def masked_sims(
    queries: jax.Array,
    protos: jax.Array,
    valid: jax.Array,
    use_pallas: Optional[bool] = None,
    pallas_min_classes: int = 512,
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU for large C, jnp reference otherwise."""
    C = protos.shape[0]
    if use_pallas is None:
        use_pallas = (
            _HAS_PALLAS
            and jax.default_backend() == "tpu"
            and C >= pallas_min_classes
        )
    if not use_pallas:
        return masked_sims_ref(queries, protos, valid)
    B, D = queries.shape
    tb, tc = 128, 128
    Bp, Cp, Dp = _round_up(B, tb), _round_up(C, tc), _round_up(D, 128)
    qp = jnp.zeros((Bp, Dp), jnp.float32).at[:B, :D].set(queries)
    pp = jnp.zeros((Cp, Dp), jnp.float32).at[:C, :D].set(protos)
    vp = jnp.zeros((Cp,), bool).at[:C].set(valid)
    return masked_sims_pallas(qp, pp, vp, tile_b=tb, tile_c=tc)[:B, :C]


# ---------------------------------------------------------------------------
# scoring (reference semantics: memory.py:117-134)
# ---------------------------------------------------------------------------

def topk_scores(
    sims: jax.Array,      # [B, C] masked similarities (0 = invalid)
    valid: jax.Array,     # [C] bool
    k: int,
    bias: Optional[jax.Array] = None,   # [C] per-class calibration logit
) -> Tuple[jax.Array, jax.Array]:
    """Top-k neighbors + softmax over the selected k.

    Returns ``(scores [B,k], idx [B,k])``; slots beyond the number of valid
    prototypes get idx −1 and score 0 (FAISS pads with −1 the same way).

    ``bias`` is the post-incremental prototype recalibration (zero = exact
    reference semantics).  It shifts the similarities BEFORE top-k
    selection: at k=1 the fused prediction is exactly the nearest valid
    prototype, so a post-selection bias is inert there — the recalibration
    must be able to hand a borderline query back to its old class
    (training.fit_new_class_penalty; deliberate deviation from FAISS
    pure-distance selection, docs/architecture.md deviation #7).
    """
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # rank by (bias-adjusted) similarity; invalid lose unless fewer than k
    # valid — mask those out after top_k.  Finite sentinels (-1e9, not
    # -inf) keep the softmax NaN-free when nothing is valid.
    adj = sims if bias is None else sims + bias[None, :]
    neg = jnp.where(valid[None, :], adj, -1e9)
    vals, idx = jax.lax.top_k(neg, k)                     # [B, k]
    kk = jnp.arange(k)[None, :]
    in_range = kk < n_valid
    logits = jnp.where(in_range, vals, -1e9)
    scores = jax.nn.softmax(logits, axis=-1)
    scores = jnp.where(in_range, scores, 0.0)
    idx = jnp.where(in_range, idx, -1)
    return scores, idx


def full_scores(
    sims: jax.Array,      # [B, C]
    valid: jax.Array,     # [C]
    bias: Optional[jax.Array] = None,   # [C] per-class calibration logit
) -> jax.Array:
    """Softmax of similarities over all valid prototypes — [B, C].

    Equivalent to the reference's ``get_nearest_prototypes(emb, k=#classes)``
    path used by ``_predict_regular`` (classifier.py:424-425).  With no valid
    prototypes at all (e.g. after ``clear_memory``) every score is 0 — the
    reference returns an empty list there (memory.py:106-107) and prediction
    falls through to the head alone.

    ``bias`` (default zero = exact reference semantics) is the per-class
    recalibration fitted after incremental class addition — it counters the
    softmax-renormalization mass shift that drops old-class accuracy when new
    prototypes appear (reference issue #53 regime).
    """
    logits = jnp.where(valid[None, :], sims, -1e9)
    if bias is not None:
        logits = jnp.where(valid[None, :], logits + bias[None, :], logits)
    scores = jax.nn.softmax(logits, axis=-1)
    return jnp.where(valid[None, :], scores, 0.0)
