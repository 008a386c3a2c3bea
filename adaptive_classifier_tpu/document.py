"""Long-document classification — chunk-and-pool over the encoder window.

The reference truncates every input at the encoder's max length
(reference src/adaptive_classifier/classifier.py tokenizer call — anything
past ``max_length`` tokens is simply invisible).  Documents longer than one
window want all their text scored.  This splits the token stream into
overlapping windows, embeds every window in ONE padded device batch, and
pools:

- ``pool="mean"`` — token-count-weighted mean of window embeddings,
  renormalized, then the classifier's normal fusion.  One fused predict per
  document; the pooled vector lives in the same embedding space the
  prototypes were built from.
- ``pool="max"``  — per-class max of the per-window fused distributions,
  renormalized ("any window says X strongly"); the standard salient-window
  semantic.  (An earlier elementwise-max over *embeddings* pooled into a
  region of embedding space no prototype lives in and was near-tie fragile.)
- ``pool="vote"`` — every window predicts separately (one batched fusion),
  label scores average across windows; robust when one window's topic
  should not dilute another's.

Windows are token-aligned, not character-aligned: the document is encoded
once, the id stream is strided with ``overlap``, and each window gets its
own [CLS]…[SEP] frame — no re-tokenization per window.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def window_ids(
    body: List[int],
    chunk_body: int,
    stride: int,
) -> List[List[int]]:
    """Split a token-id stream into windows of ``chunk_body`` ids advancing
    by ``stride``; the final window is the tail (never shorter coverage)."""
    if chunk_body <= 0 or stride <= 0:
        raise ValueError("chunk_body and stride must be positive")
    if len(body) <= chunk_body:
        return [list(body)]
    wins = []
    pos = 0
    while True:
        win = body[pos : pos + chunk_body]
        wins.append(list(win))
        if pos + chunk_body >= len(body):
            break
        pos += stride
        if pos + chunk_body > len(body):
            pos = len(body) - chunk_body   # tail window, full width
    return wins


def _bucket_len(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def embed_document(clf, text: str, chunk_tokens: Optional[int] = None,
                   overlap: float = 0.25) -> Tuple[jnp.ndarray, np.ndarray]:
    """→ (window embeddings [W, D] on device, per-window token counts)."""
    tok = clf.encoder.tokenizer
    chunk_tokens = chunk_tokens or clf.config.max_length
    if not 0.0 <= overlap < 1.0:
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")
    chunk_body = max(chunk_tokens - 2, 8)   # room for [CLS]/[SEP]
    stride = max(int(chunk_body * (1.0 - overlap)), 1)

    # encode once, un-truncated; strip the frame, re-frame per window
    full = tok.encode(text, max_length=1_000_000_000)
    body = full[1:-1]
    wins = window_ids(body, chunk_body, stride)

    S = _bucket_len(chunk_body + 2, clf.encoder.SEQ_BUCKETS)
    W = len(wins)
    Wp = 1 if W == 1 else 8 if W <= 8 else ((W + 63) // 64) * 64
    ids = np.full((Wp, S), tok.pad_id, np.int32)
    mask = np.zeros((Wp, S), np.int32)
    for r, win in enumerate(wins):
        row = [tok.cls_id] + win + [tok.sep_id]
        ids[r, : len(row)] = row
        mask[r, : len(row)] = 1
    emb = clf.encoder._embed(clf.encoder.params, jnp.asarray(ids),
                             jnp.asarray(mask))[:W]
    if getattr(clf, "lexical", None) is not None:
        # document-level lexical view appended to every window: the hashed
        # bag-of-ngrams is a whole-document feature (per-window bags would
        # just be noisier slices of it), and prototypes live in the
        # composed space
        lex = clf.lexical.transform([text])
        emb = clf._compose_channels(emb, np.repeat(lex, W, axis=0))
    counts = np.asarray([len(w) + 2 for w in wins], np.float32)
    return emb, counts


def predict_document(
    clf,
    text: str,
    k: int = 5,
    chunk_tokens: Optional[int] = None,
    overlap: float = 0.25,
    pool: str = "mean",
) -> List[Tuple[str, float]]:
    """Classify a document longer than the encoder window.

    See module docstring for pooling semantics.  A document that fits one
    window degenerates to the ordinary single-window predict.
    """
    if not text:
        raise ValueError("Empty document")
    if pool not in ("mean", "max", "vote"):
        raise ValueError(f"unknown pool {pool!r}")
    if len(clf.label_to_id) == 0:
        return []

    emb, counts = embed_document(clf, text, chunk_tokens, overlap)

    if pool in ("vote", "max"):
        # one batched full-distribution fusion over all windows
        probs_rows = _window_distributions(clf, emb)
        if pool == "vote":
            agg = probs_rows.mean(axis=0)
        else:  # max: salient window per class, renormalized
            agg = probs_rows.max(axis=0)
            total = agg.sum()
            if total > 0:
                agg = agg / total
        order = np.argsort(-agg)[:k]
        return [(clf.id_to_label[int(i)], float(agg[i]))
                for i in order if agg[i] > 0 and int(i) in clf.id_to_label]

    w = jnp.asarray(counts)[:, None]
    pooled = jnp.sum(emb * w, axis=0) / jnp.sum(w)
    norm = jnp.linalg.norm(pooled)
    pooled = pooled / jnp.maximum(norm, 1e-12)
    return clf._predict_from_embedding(pooled, k=k)


def _window_distributions(clf, emb) -> np.ndarray:
    """Full fused [W, C] distributions for window embeddings (the
    ``predict_proba`` fusion semantics)."""
    from .ops import fusion

    pw, hw = clf._history_weights()
    dist = fusion.fuse_dist_from_emb(
        emb, clf.memory.state.proto, clf.memory.state.valid,
        clf.head_params, clf._active_mask(), pw, hw,
        clf.head_params is not None,
        pallas_min_classes=clf.config.pallas_knn_min_classes,
    )
    return np.asarray(dist)
