"""Prediction fusion — prototype/neural score combination, fully on device.

Implements the reference's two fusion semantics exactly:

- ``fuse_full``: ``_predict_regular`` (reference classifier.py:415-480) —
  prototype softmax over ALL valid classes + head softmax over ALL active
  classes, combined with per-label weights derived from the training history
  (<10 trained examples → proto 0.3/head 0.7, else 0.7/0.3), sum-normalized,
  top-k.
- ``fuse_topk``: ``predict_batch`` / ``_predict_from_embedding``
  (classifier.py:1308-1388, :1723-1797) — prototype softmax over only the
  top-k neighbors, head probabilities truncated to their top-k, fixed scalar
  weights.  The reference's predict-vs-predict_batch weighting inconsistency
  is preserved deliberately (SURVEY.md §2.1 "Prediction fusion").

The whole batch fuses in one jitted call — the reference loops per embedding
in Python (classifier.py:1328-1384).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from . import knn


def _sims_and_logits(emb, proto, proto_valid, head_params, has_head,
                     pallas_min_classes):
    """Shared *_from_emb preamble: masked kNN sims + head logits."""
    from ..models import head as head_lib

    sims = knn.masked_sims(emb, proto, proto_valid,
                           pallas_min_classes=pallas_min_classes)
    if has_head:
        logits = head_lib.head_forward(head_params, emb, train=False)
    else:
        logits = jnp.zeros_like(sims)
    return sims, logits


def _combined_dist(sims, logits, proto_valid, active, proto_w, head_w,
                   has_head, proto_bias=None):
    """Per-label-weight combination of prototype scores and head softmax
    (the ``_predict_regular`` semantics, reference classifier.py:449-480),
    sum-normalized.  → (combined [B, C], scorable [C]).

    ``proto_bias`` (optional [C]) is the post-incremental prototype
    recalibration; ``None``/zeros = exact reference semantics."""
    proto_scores = knn.full_scores(sims, proto_valid, bias=proto_bias)  # [B, C]
    combined = proto_scores * proto_w[None, :]
    if has_head:
        masked = jnp.where(active[None, :], logits, -1e9)
        head_probs = jax.nn.softmax(masked, axis=-1)
        head_probs = jnp.where(active[None, :], head_probs, 0.0)
        combined = combined + head_probs * head_w[None, :]
    total = jnp.sum(combined, axis=-1, keepdims=True)
    combined = jnp.where(total > 0, combined / jnp.maximum(total, 1e-12), combined)
    scorable = proto_valid | (active if has_head else jnp.zeros_like(active))
    return combined, scorable


@functools.partial(jax.jit, static_argnames=("k", "has_head"))
def fuse_full(
    sims: jax.Array,          # [B, C] masked exp(−d²) similarities
    logits: jax.Array,        # [B, C] raw head logits (ignored if not has_head)
    proto_valid: jax.Array,   # [C] bool — classes with prototypes
    active: jax.Array,        # [C] bool — registered classes (head slots)
    proto_w: jax.Array,       # [C] float — per-label prototype weight
    head_w: jax.Array,        # [C] float — per-label head weight
    k: int,
    has_head: bool,
    proto_bias: jax.Array = None,   # [C] recalibration logits (optional)
) -> Tuple[jax.Array, jax.Array]:
    """→ (scores [B, k], class ids [B, k]); empty slots get id −1, score 0."""
    combined, scorable = _combined_dist(sims, logits, proto_valid, active,
                                        proto_w, head_w, has_head, proto_bias)
    ranked = jnp.where(scorable[None, :], combined, -jnp.inf)
    vals, idx = jax.lax.top_k(ranked, k)
    n_scorable = jnp.sum(scorable.astype(jnp.int32))
    in_range = jnp.arange(k)[None, :] < n_scorable
    return jnp.where(in_range, vals, 0.0), jnp.where(in_range, idx, -1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "has_head", "pallas_min_classes",
                     "fused_min_classes"),
)
def fuse_topk_from_emb(
    emb: jax.Array,           # [B, D] normalized embeddings (on device)
    proto: jax.Array,         # [C, D] prototypes
    proto_valid: jax.Array,   # [C] bool
    head_params,              # HeadParams or None
    active: jax.Array,        # [C] bool
    proto_weight: float,
    head_weight: float,
    k: int,
    has_head: bool,
    pallas_min_classes: int = 512,
    proto_bias: jax.Array = None,
    fused_min_classes: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """kNN sims + head forward + top-k fusion as ONE device program.

    Serving hot path: collapsing the three dispatches (sims, logits, fuse)
    into a single executable matters on tunneled TPUs where each launch has
    multi-ms host RTT; it also lets XLA fuse the [B,C] intermediates so they
    never round-trip HBM.  Semantics identical to
    ``fuse_topk(masked_sims(...), head_forward(...), ...)``.

    At FAISS-scale prototype counts (``fused_min_classes > 0`` and
    ``C >= fused_min_classes`` on TPU) the prototype stage routes through
    the two-stage fused top-k kernel (ops/knn_topk.py) instead — the
    ``[B, C]`` similarity matrix never materializes; only the ``[B, k]``
    winners and the head logits do.
    """
    from . import knn_topk
    from ..models import head as head_lib

    C = proto.shape[0]
    kk = min(k, C)
    if (fused_min_classes and C >= fused_min_classes and kk <= 128
            and (jax.default_backend() == "tpu" or knn_topk.FORCE_FUSED)):
        topk_sc, topk_idx = knn_topk.topk_scores_fused(
            emb, proto, proto_valid, kk, bias=proto_bias)
        if has_head:
            logits = head_lib.head_forward(head_params, emb, train=False)
        else:
            logits = jnp.zeros((emb.shape[0], C))
        return _fuse_from_proto_topk(topk_sc, topk_idx, logits, active, C,
                                     proto_weight, head_weight, kk, has_head)
    sims, logits = _sims_and_logits(emb, proto, proto_valid, head_params,
                                    has_head, pallas_min_classes)
    return fuse_topk(sims, logits, proto_valid, active,
                     proto_weight, head_weight, k, has_head,
                     proto_bias=proto_bias)


@functools.partial(
    jax.jit, static_argnames=("k", "has_head", "pallas_min_classes")
)
def fuse_full_from_emb(
    emb: jax.Array,           # [B, D]
    proto: jax.Array,         # [C, D]
    proto_valid: jax.Array,   # [C] bool
    head_params,              # HeadParams or None
    active: jax.Array,        # [C] bool
    proto_w: jax.Array,       # [C] per-label weights
    head_w: jax.Array,        # [C]
    k: int,
    has_head: bool,
    pallas_min_classes: int = 512,
    proto_bias: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """kNN sims + head forward + full-class fusion as ONE device program
    (the ``_predict_regular`` semantics — per-label history weights)."""
    sims, logits = _sims_and_logits(emb, proto, proto_valid, head_params,
                                    has_head, pallas_min_classes)
    return fuse_full(sims, logits, proto_valid, active, proto_w, head_w,
                     k, has_head, proto_bias=proto_bias)


@functools.partial(jax.jit, static_argnames=("has_head", "pallas_min_classes"))
def fuse_dist_from_emb(
    emb: jax.Array,           # [B, D] normalized embeddings (on device)
    proto: jax.Array,         # [C, D]
    proto_valid: jax.Array,   # [C] bool
    head_params,              # HeadParams or None
    active: jax.Array,        # [C] bool
    proto_w: jax.Array,       # [C] per-label weights
    head_w: jax.Array,        # [C]
    has_head: bool,
    pallas_min_classes: int = 512,
    proto_bias: jax.Array = None,
) -> jax.Array:
    """Full fused probability distribution ``[B, C]`` as one device program.

    The same per-label-weight combination ``fuse_full`` ranks
    (``_predict_regular`` semantics, reference classifier.py:415-480), but
    returned whole instead of top-k'd — the ``predict_proba`` surface.
    Rows sum to 1 over scorable classes; non-scorable columns are 0.
    """
    sims, logits = _sims_and_logits(emb, proto, proto_valid, head_params,
                                    has_head, pallas_min_classes)
    combined, scorable = _combined_dist(sims, logits, proto_valid, active,
                                        proto_w, head_w, has_head, proto_bias)
    return jnp.where(scorable[None, :], combined, 0.0)


def _fuse_from_proto_topk(
    topk_scores: jax.Array,   # [B, kk] softmaxed prototype scores
    topk_idx: jax.Array,      # [B, kk] class ids (−1 = padding)
    logits: jax.Array,        # [B, C] raw head logits
    active: jax.Array,        # [C] bool
    C: int,
    proto_weight: float,
    head_weight: float,
    kk: int,
    has_head: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Shared fuse_topk tail: scatter proto top-k + head top-k, renormalize,
    final top-k.  Factored out so the large-C path can feed it from the
    fused two-stage kernel (ops/knn_topk.py) without materializing sims."""
    B = topk_scores.shape[0]
    rows = jnp.arange(B)[:, None]
    proto_vec = jnp.zeros((B, C))
    safe_idx = jnp.clip(topk_idx, 0)
    proto_vec = proto_vec.at[rows, safe_idx].add(
        jnp.where(topk_idx >= 0, topk_scores, 0.0)
    )
    combined = proto_vec * proto_weight
    if has_head:
        masked = jnp.where(active[None, :], logits, -1e9)
        head_probs = jax.nn.softmax(masked, axis=-1)
        head_probs = jnp.where(active[None, :], head_probs, 0.0)
        # keep only each row's top-k head probabilities (classifier.py:1347-1354)
        hvals, hidx = jax.lax.top_k(head_probs, kk)
        head_vec = jnp.zeros((B, C)).at[rows, hidx].add(hvals)
        combined = combined + head_vec * head_weight
    total = jnp.sum(combined, axis=-1, keepdims=True)
    combined = jnp.where(total > 0, combined / jnp.maximum(total, 1e-12), combined)
    ranked = jnp.where(combined > 0, combined, -jnp.inf)
    vals, idx = jax.lax.top_k(ranked, kk)
    ok = vals > -jnp.inf
    return jnp.where(ok, vals, 0.0), jnp.where(ok, idx, -1)


@functools.partial(jax.jit, static_argnames=("k", "has_head"))
def fuse_topk(
    sims: jax.Array,
    logits: jax.Array,
    proto_valid: jax.Array,
    active: jax.Array,
    proto_weight: float,
    head_weight: float,
    k: int,
    has_head: bool,
    proto_bias: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k-restricted fusion with fixed scalar weights → (scores, ids)."""
    B, C = sims.shape
    kk = min(k, C)
    topk_scores, topk_idx = knn.topk_scores(sims, proto_valid, kk,
                                            bias=proto_bias)         # [B, kk]
    return _fuse_from_proto_topk(topk_scores, topk_idx, logits, active, C,
                                 proto_weight, head_weight, kk, has_head)
