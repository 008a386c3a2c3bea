"""Classifier API contract tests (reference analog: tests/test_classifier.py)."""

import numpy as np
import pytest

from adaptive_classifier_tpu import AdaptiveClassifier


@pytest.fixture(scope="module")
def trained(synth_classifier_factory):
    clf = synth_classifier_factory()
    texts = [f"pos:{i}" for i in range(8)] + [f"neg:{i}" for i in range(8)]
    labels = ["positive"] * 8 + ["negative"] * 8
    clf.add_examples(texts, labels)
    return clf


def test_initialization(tiny_classifier_factory):
    clf = tiny_classifier_factory()
    assert clf.embedding_dim == 128
    assert clf.label_to_id == {}
    assert clf.train_steps == 0
    assert clf.head_params is None


def test_add_and_predict(trained):
    preds = trained.predict("pos:99", k=2)
    assert len(preds) == 2
    assert preds[0][0] == "positive"
    assert all(isinstance(l, str) and 0 <= s <= 1 for l, s in preds)
    assert abs(sum(s for _, s in preds) - 1.0) < 1e-4
    preds = trained.predict("neg:99", k=2)
    assert preds[0][0] == "negative"


def test_label_ids_alphabetical(trained):
    assert trained.label_to_id == {"negative": 0, "positive": 1}


def test_empty_input_raises(trained):
    with pytest.raises(ValueError):
        trained.predict("")
    with pytest.raises(ValueError):
        trained.add_examples([], [])
    with pytest.raises(ValueError):
        trained.add_examples(["a"], ["x", "y"])
    with pytest.raises(ValueError):
        trained.predict_batch([])


def test_predict_batch(trained):
    queries = ["pos:100", "neg:100", "pos:101"]
    batch = trained.predict_batch(queries, k=2)
    assert len(batch) == 3
    assert batch[0][0][0] == "positive"
    assert batch[1][0][0] == "negative"
    # batch matches per-item fixed-weight path
    for q, preds in zip(queries, batch):
        assert abs(sum(s for _, s in preds) - 1.0) < 1e-4


def test_k_parameter_consistency(trained):
    """k=1 vs k=2 top prediction must agree (the reference's k-parameter
    regression, test_enterprise_classifiers_integration.py:265-299)."""
    p1 = trained.predict("pos:55", k=1)
    p2 = trained.predict("pos:55", k=2)
    assert p1[0][0] == p2[0][0]


def test_dynamic_class_addition(synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples([f"a:{i}" for i in range(6)] + [f"b:{i}" for i in range(6)],
                     ["alpha"] * 6 + ["beta"] * 6)
    assert clf.predict("a:9")[0][0] == "alpha"
    # add a brand-new class at runtime (incremental path)
    clf.add_examples([f"c:{i}" for i in range(6)], ["gamma"] * 6)
    assert "gamma" in clf.label_to_id
    assert clf.label_to_id["gamma"] == 2
    preds = clf.predict("c:9", k=3)
    assert preds[0][0] == "gamma"
    # old classes still predicted correctly (accuracy preservation)
    assert clf.predict("a:9", k=3)[0][0] == "alpha"
    assert clf.predict("b:9", k=3)[0][0] == "beta"


def test_train_steps_increment(synth_classifier_factory):
    clf = synth_classifier_factory()
    assert clf.train_steps == 0
    clf.add_examples(["x:1", "y:1"], ["x", "y"])
    assert clf.train_steps == 1
    clf.add_examples(["x:2", "y:2"], ["x", "y"])
    assert clf.train_steps == 2


def test_training_history_accumulates(trained):
    assert trained.training_history["positive"] == 8
    assert trained.training_history["negative"] == 8


def test_memory_stats(trained):
    stats = trained.get_memory_stats()
    assert stats["num_classes"] == 2
    assert stats["total_examples"] == 16


def test_example_statistics(trained):
    stats = trained.get_example_statistics()
    assert stats["total_examples"] == 16
    assert stats["num_classes"] == 2
    assert stats["model_params"] > 0
    assert stats["memory_usage"]["examples"] > 0


def test_clear_memory(synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples(["x:1", "y:1", "x:2", "y:2"], ["x", "y", "x", "y"])
    clf.clear_memory(labels=["x"])
    stats = clf.get_memory_stats()
    assert "x" not in stats["examples_per_class"]
    assert "y" in stats["examples_per_class"]
    clf.clear_memory()
    assert clf.get_memory_stats()["total_examples"] == 0
    # label maps survive a clear (reference clears only memory)
    assert "y" in clf.label_to_id


def test_merge_classifiers(synth_classifier_factory):
    a = synth_classifier_factory()
    a.add_examples([f"p:{i}" for i in range(5)], ["p"] * 5)
    b = synth_classifier_factory()
    b.add_examples([f"q:{i}" for i in range(5)], ["q"] * 5)
    a.merge_classifiers(b)
    assert set(a.label_to_id) == {"p", "q"}
    assert a.get_memory_stats()["total_examples"] == 10
    assert a.predict("q:9")[0][0] == "q"


def test_capacity_bucket_crossing(synth_classifier_factory):
    """Adding classes past the first capacity bucket (8) must keep old
    classes intact — growth is repadding, not retraining from zero."""
    clf = synth_classifier_factory()
    labels = [f"cls{i:02d}" for i in range(6)]
    texts = [f"{l}:{j}" for l in labels for j in range(4)]
    clf.add_examples(texts, [l for l in labels for _ in range(4)])
    assert clf.predict("cls00:9")[0][0] == "cls00"
    more = [f"cls{i:02d}" for i in range(6, 12)]
    clf.add_examples([f"{l}:{j}" for l in more for j in range(4)],
                     [l for l in more for _ in range(4)])
    assert clf._class_capacity >= 12
    assert clf.predict("cls09:5", k=12)[0][0] == "cls09"
    assert clf.predict("cls00:9", k=12)[0][0] == "cls00"


def test_to_device_noop(trained):
    assert trained.to("cpu") is trained


def test_profiling_stages(synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples(["p:1", "q:1"], ["p", "q"])
    timers = clf.enable_profiling()
    clf._emb_cache = None  # bypass cache so encoder stages run
    clf.config.embedding_cache_size = 0
    clf._get_embeddings = type(clf)._get_embeddings.__get__(clf)  # restore real path
    clf.predict_batch(["hello world"], k=1)
    summary = timers.summary()
    assert "knn_fusion" in summary
    assert "tokenize" in summary and "encoder_forward" in summary
    assert timers.report()


def test_predict_after_clear_memory_uses_head_only(synth_classifier_factory):
    """After clear_memory, prototype scores are all zero (reference returns
    [] from the empty index) and predictions come from the head alone —
    must be NaN-free probabilities."""
    clf = synth_classifier_factory()
    clf.add_examples(["m:1", "n:1", "m:2", "n:2"], ["m", "n", "m", "n"])
    clf.clear_memory()
    preds = clf.predict("m:1", k=2)
    assert len(preds) == 2
    for _, s in preds:
        assert np.isfinite(s) and 0.0 <= s <= 1.0
    assert abs(sum(s for _, s in preds) - 1.0) < 1e-4
    batch = clf.predict_batch(["m:1"], k=2)[0]
    assert all(np.isfinite(s) for _, s in batch)


def test_pipelined_embedding_matches_sequential(tiny_classifier_factory):
    """The lookahead input pipeline (>64 texts) returns the same embeddings
    as the single-chunk path."""
    clf = tiny_classifier_factory()
    texts = [f"sample text number {i} with words" for i in range(150)]
    piped = clf._embed_uncached(texts)
    # sequential reference: one chunk at a time
    seq = np.concatenate([clf._embed_uncached(texts[s:s + 64]) for s in (0, 64, 128)])
    np.testing.assert_allclose(piped, seq, atol=1e-6)
    assert piped.shape == (150, clf.embedding_dim)


def test_predict_batch_batch_size_honored(trained):
    """batch_size caps the per-dispatch device chunk (was accepted-and-
    ignored); results must be identical to the default chunking."""
    queries = [f"pos:{i}" for i in range(5)] + [f"neg:{i}" for i in range(4)]
    default = trained.predict_batch(queries, k=2)
    small = trained.predict_batch(queries, k=2, batch_size=2)
    # chunk override rides the call (not instance state — concurrent
    # serving workers must not race on it), so nothing to clean up here
    for a, b in zip(default, small):
        assert [l for l, _ in a] == [l for l, _ in b]
        for (_, sa), (_, sb) in zip(a, b):
            assert abs(sa - sb) < 1e-5
