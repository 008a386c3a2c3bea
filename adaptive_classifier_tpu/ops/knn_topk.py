"""Two-stage fused top-k kNN kernel — large-index search without the
``[B, C]`` HBM round-trip.

The base kNN path (``ops/knn.py``) materializes the full ``[B, C]``
similarity matrix in HBM and runs ``jax.lax.top_k`` over it.  That is
optimal up to mid-sized indexes, but at FAISS-scale prototype counts
(C ≥ ~10⁵ — the regime the reference's ``IndexFlatL2`` exists for,
reference src/adaptive_classifier/memory.py:34,114) the similarity matrix
itself becomes the bandwidth bill: at C = 131072, B = 128 it is 67 MB
written + re-read per search, plus an XLA sort-based top_k over 131072
lanes per query.

This kernel never materializes it.  The grid walks (query-tile ×
prototype-tile); each step computes the tile's L2 distances on the MXU
(``‖q‖²+‖p‖²−2qp`` expansion, like the base kernel), converts to the
reference's ``exp(−d²)`` similarity on the VPU, and folds the tile's
candidates into a VMEM-resident running top-k buffer via a k-pass
select-max merge.  Only the final ``[B, pad(k)]`` winners ever reach HBM
— the HBM traffic is the prototype stream itself, which is the lower
bound for exact search.

Tie-breaking matches ``jax.lax.top_k`` (equal values → lower prototype
index): the merge prefers the earliest candidate, and tiles are visited
in ascending index order.

Scoring semantics match ``ops/knn.topk_scores`` exactly (reference
memory.py:117-134): similarity ``exp(−d²)``, softmax over the k returned
neighbors, −1 index / 0 score padding past the number of valid prototypes.
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

#: running-buffer width — one lane register; k ≤ _KPAD
_KPAD = 128

#: trace-time dispatch counter: increments whenever the fused kernel is
#: traced into a program (bench.py uses it to PROVE the fused path is the
#: one actually compiled into predict_batch, not just config-eligible)
FUSED_DISPATCHES = 0

#: test hook: force the fused route on non-TPU backends (used with
#: pltpu.force_tpu_interpret_mode() so CPU CI can exercise the kernel path)
FORCE_FUSED = False

_NEG = np.float32(-1e9)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(k: int, tile_c: int):
    """Kernel closure over static (k, tile_c)."""

    def kernel(q_ref, p_ref, valid_ref, bias_ref, vals_ref, idx_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            vals_ref[:] = jnp.full(vals_ref.shape, _NEG, jnp.float32)
            idx_ref[:] = jnp.full(idx_ref.shape, -1, jnp.int32)

        q = q_ref[:]                                   # [TB, D]
        p = p_ref[:]                                   # [TC, D]
        qn = jnp.sum(q * q, axis=1, keepdims=True)     # [TB, 1]
        pn = jnp.sum(p * p, axis=1, keepdims=True).T   # [1, TC]
        cross = jax.lax.dot_general(
            q, p, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [TB, TC]
        d2 = jnp.maximum(qn + pn - 2.0 * cross, 0.0)
        # bias shifts similarities BEFORE selection (the post-incremental
        # recalibration contract, ops/knn.topk_scores) — zero = pure distance
        sims = jnp.where(valid_ref[:] > 0, jnp.exp(-d2) + bias_ref[:], _NEG)

        tb = sims.shape[0]
        # candidate pool = running top-k ‖ this tile; ids: running buffer
        # first (earlier tiles → lower global ids → top_k tie semantics)
        tile_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, tile_c), 1) + j * tile_c
        cand_v = jnp.concatenate([vals_ref[:, :k], sims], axis=1)
        cand_i = jnp.concatenate([idx_ref[:, :k], tile_ids], axis=1)
        width = k + tile_c
        pos = jax.lax.broadcasted_iota(jnp.int32, (tb, width), 1)

        new_v = jnp.full((tb, _KPAD), _NEG, jnp.float32)
        new_i = jnp.full((tb, _KPAD), -1, jnp.int32)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (tb, _KPAD), 1)
        for t in range(k):
            m = jnp.max(cand_v, axis=1, keepdims=True)            # [TB, 1]
            # first occurrence of the max — lower index wins on ties
            am = jnp.min(jnp.where(cand_v == m, pos, width), axis=1,
                         keepdims=True)                            # [TB, 1]
            sel_i = jnp.sum(jnp.where(pos == am, cand_i, 0), axis=1,
                            keepdims=True)                         # [TB, 1]
            new_v = jnp.where(out_lane == t, m, new_v)
            new_i = jnp.where(out_lane == t, sel_i, new_i)
            cand_v = jnp.where(pos == am, _NEG, cand_v)
        vals_ref[:] = new_v
        idx_ref[:] = new_i

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "tile_b", "tile_c"))
def _topk_sims_pallas(
    queries: jax.Array,   # [B, D]  (padded to tile multiples)
    protos: jax.Array,    # [C, D]
    valid: jax.Array,     # [C] bool
    bias: jax.Array,      # [C] float32 pre-selection similarity shift
    k: int,
    tile_b: int,
    tile_c: int,
) -> Tuple[jax.Array, jax.Array]:
    B, D = queries.shape
    C = protos.shape[0]
    assert B % tile_b == 0 and C % tile_c == 0, (B, C, tile_b, tile_c)
    valid_row = valid.astype(jnp.int32)[None, :]
    bias_row = bias.astype(jnp.float32)[None, :]

    grid = (B // tile_b, C // tile_c)
    vals, idx = pl.pallas_call(
        _make_kernel(k, tile_c),
        out_shape=(
            jax.ShapeDtypeStruct((B, _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((B, _KPAD), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # same out block for every j → stays VMEM-resident across the
            # prototype walk (the running top-k state), one HBM write per i
            pl.BlockSpec((tile_b, _KPAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, _KPAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * D + 6 * B * C,
            bytes_accessed=4 * (B * D + C * D + 2 * B * _KPAD),
            transcendentals=B * C,
        ),
    )(queries, protos, valid_row, bias_row)
    return vals, idx


def topk_scores_fused(
    queries: jax.Array,   # [B, D] float32
    protos: jax.Array,    # [C, D] float32
    valid: jax.Array,     # [C] bool
    k: int,
    tile_b: int = 128,
    tile_c: int = 1024,
    return_raw: bool = False,
    bias: Optional[jax.Array] = None,   # [C] pre-selection shift
):
    """Fused exact top-k search: ``(scores [B,k], idx [B,k])``.

    Drop-in equivalent of ``masked_sims(...)`` + ``topk_scores(...)`` that
    never materializes the ``[B, C]`` similarity matrix.  ``k ≤ 128``.
    With ``return_raw=True`` also returns the raw ``exp(−d²)`` similarity
    of each selected neighbor (pre-softmax — what ``min_similarity``
    thresholds), 0 past the valid count.  ``bias`` (optional [C]) shifts
    similarities BEFORE the in-kernel selection — the post-incremental
    prototype recalibration contract (ops/knn.topk_scores); the raw
    similarities returned are bias-free (selection is biased, the
    ``min_similarity`` scale is not).

    Measured (v5e, D=768, k=10, serial-dependency chains): 2.09× the
    materialized Pallas-sims + ``lax.top_k`` path at B=1024/C=262144,
    1.93× at B=256/C=1048576, exact index match at every tested size.
    """
    if k > _KPAD:
        raise ValueError(f"fused top-k supports k ≤ {_KPAD}, got {k}")
    global FUSED_DISPATCHES
    FUSED_DISPATCHES += 1
    B, D = queries.shape
    C = protos.shape[0]
    # VMEM guard: the prototype tile is [tile_c, Dp] f32 and must fit
    # alongside the query tile + running buffers.  At D=768 the default
    # 1024 tile is ~3 MB; at lexical-channel widths (D≈8704) it would be
    # ~35 MB — clamp so the tile stays ≤ ~6 MB (VMEM is ~16 MB/core).
    Dp_est = _round_up(D, 128)
    max_tile_c = max(128, (6 * 1024 * 1024 // (4 * Dp_est)) // 128 * 128)
    tile_c = min(tile_c, max_tile_c)
    if tile_b * Dp_est * 4 > 4 * 1024 * 1024:
        tile_b = max(8, (4 * 1024 * 1024 // (4 * Dp_est)) // 8 * 8)
    tile_c = min(tile_c, _round_up(C, 128))
    Bp, Cp, Dp = _round_up(B, tile_b), _round_up(C, tile_c), _round_up(D, 128)
    qp = jnp.zeros((Bp, Dp), jnp.float32).at[:B, :D].set(queries)
    pp = jnp.zeros((Cp, Dp), jnp.float32).at[:C, :D].set(protos)
    vp = jnp.zeros((Cp,), bool).at[:C].set(valid)
    bp = jnp.zeros((Cp,), jnp.float32)
    if bias is not None:
        bp = bp.at[:C].set(bias.astype(jnp.float32))

    vals, idx = _topk_sims_pallas(qp, pp, vp, bp, k, tile_b, tile_c)
    vals, idx = vals[:B, :k], idx[:B, :k]

    # reference scoring semantics (ops/knn.topk_scores / memory.py:117-134)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    in_range = jnp.arange(k)[None, :] < n_valid
    logits = jnp.where(in_range, vals, -1e9)
    scores = jax.nn.softmax(logits, axis=-1)
    scores = jnp.where(in_range, scores, 0.0)
    idx = jnp.where(in_range, idx, -1)
    if return_raw:
        raw = vals if bias is None else vals - bp[jnp.maximum(idx, 0)]
        return scores, idx, jnp.where(in_range, raw, 0.0)
    return scores, idx


def topk_scores_auto(
    queries: jax.Array,
    protos: jax.Array,
    valid: jax.Array,
    k: int,
    use_fused: Optional[bool] = None,
    fused_min_classes: int = 16384,
    return_raw: bool = False,
    bias: Optional[jax.Array] = None,
):
    """Dispatch: fused two-stage kernel above ``fused_min_classes`` on TPU,
    the materialized ``masked_sims`` + ``topk_scores`` path otherwise.
    ``bias`` shifts similarities before selection in BOTH paths (the
    recalibration contract); raw similarities stay bias-free."""
    from . import knn

    C = protos.shape[0]
    if use_fused is None:
        use_fused = (
            _HAS_PALLAS
            and jax.default_backend() == "tpu"
            and C >= fused_min_classes
            and k <= _KPAD
        )
    if use_fused:
        return topk_scores_fused(queries, protos, valid, k,
                                 return_raw=return_raw, bias=bias)
    sims = knn.masked_sims(queries, protos, valid)
    scores, idx = knn.topk_scores(sims, valid, k, bias=bias)
    if return_raw:
        raw = jnp.take_along_axis(
            sims, jnp.maximum(idx, 0), axis=1)
        return scores, idx, jnp.where(idx >= 0, raw, 0.0)
    return scores, idx
