"""Confidence-behavior regressions (reference analogs:
tests/test_single_example_confidence.py, test_reported_confidence_drop.py,
test_confidence_consistency.py)."""

import numpy as np
import pytest

from adaptive_classifier_tpu import AdaptiveClassifier
from tests.conftest import synthetic_embed


def _reload(path):
    clf = AdaptiveClassifier.load(str(path))
    clf._get_embeddings = lambda texts: synthetic_embed(texts, dim=clf.embedding_dim)
    return clf


def test_single_example_per_class(synth_classifier_factory, tmp_path):
    """One example per class must still produce sane, persistent confidence
    (reference test_single_example_confidence.py)."""
    clf = synth_classifier_factory()
    clf.add_examples(["alpha:only", "beta:only"], ["alpha", "beta"])
    preds = clf.predict("alpha:only", k=2)
    assert preds[0][0] == "alpha"
    assert 0.4 < preds[0][1] <= 1.0

    p = tmp_path / "single"
    clf.save(str(p))
    clf2 = _reload(p)
    preds2 = clf2.predict("alpha:only", k=2)
    assert preds2[0][0] == "alpha"
    assert abs(preds2[0][1] - preds[0][1]) < 0.01


def test_history_weight_switchover(synth_classifier_factory):
    """Fusion weights flip at 10 trained examples (classifier.py:449-467):
    the weight vectors must reflect the per-class training history."""
    clf = synth_classifier_factory()
    clf.add_examples([f"few:{i}" for i in range(5)], ["few"] * 5)
    clf.add_examples([f"many:{i}" for i in range(12)], ["many"] * 12)
    pw, hw = clf._history_weights()
    pw = np.asarray(pw)
    few_id, many_id = clf.label_to_id["few"], clf.label_to_id["many"]
    assert pw[few_id] == pytest.approx(0.3)   # new class → trust head
    assert pw[many_id] == pytest.approx(0.7)  # established → trust prototypes
    assert np.asarray(hw)[few_id] == pytest.approx(0.7)


def test_confidence_no_drop_after_reload_with_history(synth_classifier_factory, tmp_path):
    """The reported-confidence-drop bug class (reference
    test_reported_confidence_drop.py): training_history persisting across
    save/load keeps fusion weights — and therefore confidences — identical."""
    clf = synth_classifier_factory()
    clf.add_examples([f"a:{i}" for i in range(15)] + [f"b:{i}" for i in range(15)],
                     ["a"] * 15 + ["b"] * 15)
    before = clf.predict("a:99", k=2)
    p = tmp_path / "hist"
    clf.save(str(p))
    clf2 = _reload(p)
    assert clf2.training_history == {"a": 15, "b": 15}
    after = clf2.predict("a:99", k=2)
    assert after[0][0] == before[0][0]
    assert abs(after[0][1] - before[0][1]) < 0.01


def test_predictions_are_probabilities(synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples([f"x:{i}" for i in range(4)] + [f"y:{i}" for i in range(4)],
                     ["x"] * 4 + ["y"] * 4)
    for q in ["x:9", "y:9", "unrelated text"]:
        preds = clf.predict(q, k=2)
        assert all(0.0 <= s <= 1.0 for _, s in preds)
        assert abs(sum(s for _, s in preds) - 1.0) < 1e-4
