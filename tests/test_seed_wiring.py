"""Seed-wiring diagnostic (round-3 weak #8: zero seed-spread rows).

EVAL_r03's hallucination and heldout-preservation rows showed spread
exactly 0.0 across seeds 42/43/44 on every metric, while strategic rows on
the same seed mechanism showed real spread.  The hypothesis to verify:
prototype-dominated k=1 fusion swamps head-init variance — i.e. the seed IS
wired (different head params, different fused distributions), but argmax on
these sets never flips.  This test distinguishes "robust" from "seed not
wired" directly, on a real-weight encoder (checkpoints/ac-tiny) so the
embedding space is fixed across seeds (offline-mode encoders would
confound — their weights derive from the seed).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from adaptive_classifier_tpu import AdaptiveClassifier

REPO = Path(__file__).resolve().parent.parent
AC_TINY = REPO / "checkpoints" / "ac-tiny"

pytestmark = pytest.mark.skipif(
    not (AC_TINY / "model.safetensors").exists(),
    reason="needs the committed ac-tiny checkpoint",
)


def _hallucination_rows(n=24):
    blob = json.loads((REPO / "data" / "hallucination.json").read_text())
    rows = blob["train"][:n]
    texts = [f"{r['context']} [SEP] {r['response']}" for r in rows]
    labels = [r["label"] for r in rows]
    return texts, labels


def _build(seed: int):
    clf = AdaptiveClassifier(str(AC_TINY), seed=seed)
    texts, labels = _hallucination_rows()
    clf.add_examples(texts, labels)
    return clf


def test_seed_changes_head_params_and_distributions():
    """Two seeds ⇒ different MLP head params AND measurably different fused
    distributions on the hallucination set, even where argmax agrees."""
    a, b = _build(42), _build(43)

    # (1) the head params must actually differ (init + shuffle are seeded)
    wa = np.asarray(a.head_params["out"]["w"])
    wb = np.asarray(b.head_params["out"]["w"])
    assert not np.allclose(wa, wb), "seed did not reach head training"

    # (2) fused distributions must differ measurably on real queries
    blob = json.loads((REPO / "data" / "hallucination.json").read_text())
    queries = [f"{r['context']} [SEP] {r['response']}"
               for r in blob["test"][:32]]
    pa, labels_a = a.predict_proba(queries)
    pb, labels_b = b.predict_proba(queries)
    assert labels_a == labels_b
    max_diff = float(np.max(np.abs(pa - pb)))
    assert max_diff > 1e-4, (
        f"fused distributions identical across seeds (max diff {max_diff}) "
        "— seed is not wired into the prediction path")

    # (3) embeddings are seed-independent (frozen real-weight encoder) —
    # the difference above is the HEAD's, not an encoder confound
    ea = a._get_embeddings(queries[:4])
    eb = b._get_embeddings(queries[:4])
    np.testing.assert_allclose(ea, eb, atol=1e-6)


def test_ridge_head_is_seed_deterministic():
    """With head_type="ridge" zero spread is DESIGNED: the closed-form
    solve has no init and no shuffle, so two seeds must produce
    bit-identical heads — the documented explanation for zero-spread rows
    in ridge-config evals (seed variance can then only enter through data
    sampling, e.g. incremental-path selection)."""
    texts, labels = _hallucination_rows()
    cfg = {"head_type": "ridge"}
    a = AdaptiveClassifier(str(AC_TINY), seed=42, config=cfg)
    a.add_examples(texts, labels)
    b = AdaptiveClassifier(str(AC_TINY), seed=43, config=cfg)
    b.add_examples(texts, labels)
    np.testing.assert_array_equal(np.asarray(a.head_params["out"]["w"]),
                                  np.asarray(b.head_params["out"]["w"]))
