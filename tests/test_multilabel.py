"""Multi-label tests (reference analog: tests/test_multilabel.py)."""

import numpy as np
import pytest

from adaptive_classifier_tpu import MultiLabelAdaptiveClassifier
from tests.conftest import synthetic_embed


@pytest.fixture(scope="module")
def ml_factory():
    def make(**kw):
        cfg = {
            "train_size_buckets": [64, 256],
            "class_capacity_buckets": [8, 16, 32],
            "example_capacity_buckets": [32, 128],
        }
        clf = MultiLabelAdaptiveClassifier("prajjwal1/bert-tiny", config=cfg, **kw)
        clf._get_embeddings = lambda texts: synthetic_embed(texts, dim=clf.embedding_dim)
        return clf

    return make


def test_adaptive_threshold_table(ml_factory):
    """Threshold table values (reference test_multilabel.py:78-85)."""
    clf = ml_factory(default_threshold=0.5)
    assert clf._get_adaptive_threshold(2) == 0.5
    assert clf._get_adaptive_threshold(5) == pytest.approx(0.4)
    assert clf._get_adaptive_threshold(10) == pytest.approx(0.3)
    assert clf._get_adaptive_threshold(20) == pytest.approx(0.2)
    assert clf._get_adaptive_threshold(25) == pytest.approx(0.1)


def test_add_and_predict_multilabel(ml_factory):
    clf = ml_factory()
    texts = [f"tech:{i}" for i in range(6)] + [f"sport:{i}" for i in range(6)] + [f"mix:{i}" for i in range(6)]
    labels = [["tech"]] * 6 + [["sport"]] * 6 + [["tech", "sport"]] * 6
    clf.add_examples(texts, labels)
    preds = clf.predict_multilabel("mix:99")
    assert len(preds) >= 1
    labels_out = [l for l, _ in preds]
    assert set(labels_out) <= {"tech", "sport"}
    # multi-label text should surface both labels
    assert "tech" in labels_out and "sport" in labels_out


def test_min_predictions_backfill(ml_factory):
    """'No labels met the threshold' regression (test_multilabel.py:149-174):
    min_predictions forces backfill below threshold."""
    clf = ml_factory(default_threshold=0.99, min_predictions=2)
    clf.add_examples(
        [f"a:{i}" for i in range(5)] + [f"b:{i}" for i in range(5)],
        [["a"]] * 5 + [["b"]] * 5,
    )
    preds = clf.predict_multilabel("a:99", threshold=0.999999)
    assert len(preds) >= 2


def test_max_labels_limit(ml_factory):
    clf = ml_factory()
    clf.add_examples(
        [f"x{j}:{i}" for j in range(4) for i in range(4)],
        [[f"x{j}"] for j in range(4) for _ in range(4)],
    )
    preds = clf.predict_multilabel("x0:9", threshold=0.0, max_labels=2)
    assert len(preds) <= 2


def test_label_thresholds_by_frequency(ml_factory):
    """Rare labels get 0.3×, common >30% get 1.2× (multilabel.py:280-307)."""
    clf = ml_factory(default_threshold=0.5)
    texts = [f"common:{i}" for i in range(30)] + ["rare:0"]
    labels = [["common"]] * 30 + [["rare"]]
    clf.add_examples(texts, labels)
    assert clf.label_thresholds["common"] == pytest.approx(0.6)
    assert clf.label_thresholds["rare"] == pytest.approx(0.15)


def test_empty_inputs_raise(ml_factory):
    clf = ml_factory()
    with pytest.raises(ValueError):
        clf.add_examples([], [])
    with pytest.raises(ValueError):
        clf.add_examples(["a"], [["x"], ["y"]])
    with pytest.raises(ValueError):
        clf.predict_multilabel("")


def test_texts_without_labels_skipped(ml_factory):
    clf = ml_factory()
    clf.add_examples(["a:1", "skip:1", "b:1"], [["a"], [], ["b"]])
    stats = clf.get_memory_stats()
    assert stats["total_examples"] == 2


def test_label_statistics(ml_factory):
    clf = ml_factory(default_threshold=0.4, min_predictions=2, max_predictions=5)
    clf.add_examples(["a:1", "b:1"], [["a"], ["b"]])
    stats = clf.get_label_statistics()
    assert stats["default_threshold"] == 0.4
    assert stats["min_predictions"] == 2
    assert stats["max_predictions"] == 5
    assert "label_thresholds" in stats
    assert "adaptive_threshold" in stats


def test_save_load_multilabel(ml_factory, tmp_path):
    clf = ml_factory()
    clf.add_examples(
        [f"a:{i}" for i in range(5)] + [f"b:{i}" for i in range(5)],
        [["a"]] * 5 + [["b"]] * 5,
    )
    p = tmp_path / "ml"
    clf.save(str(p))
    clf2 = MultiLabelAdaptiveClassifier.load(str(p))
    clf2._get_embeddings = lambda texts: synthetic_embed(texts, dim=clf2.embedding_dim)
    assert clf2.label_to_id == clf.label_to_id
    preds = clf2.predict_multilabel("a:99", threshold=0.0)
    assert len(preds) >= 1


def test_25_label_no_threshold_regression(ml_factory):
    """25-label 'no labels met the threshold criteria' regression
    (reference test_multilabel.py:149-174): with many labels the adaptive
    threshold drops to 0.2x and min_predictions backfills."""
    clf = ml_factory(min_predictions=1)
    labels = [f"lab{i:02d}" for i in range(25)]
    texts = [f"{l}:{j}" for l in labels for j in range(2)]
    clf.add_examples(texts, [[l] for l in labels for _ in range(2)])
    assert clf._get_adaptive_threshold(25) == pytest.approx(clf.default_threshold * 0.2)
    preds = clf.predict_multilabel("lab00:9")
    assert len(preds) >= 1  # never empty


def test_predict_falls_back_to_base(ml_factory):
    """predict() falls back to single-label fusion when multilabel returns
    nothing (multilabel.py:231-243)."""
    clf = ml_factory(default_threshold=1.5)  # impossible threshold, no backfill
    clf.min_predictions = 0
    clf.add_examples(["a:1", "b:1"], [["a"], ["b"]])
    preds = clf.predict("a:1", k=2)
    assert preds  # base fusion path produced results
