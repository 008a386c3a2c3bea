"""New-class accuracy-preservation regression (reference analog:
tests/test_new_class_accuracy_preservation.py — issue #53: adding classes to
a many-class classifier must not collapse old-class accuracy)."""

import numpy as np
import pytest


def accuracy(clf, queries, expected):
    correct = 0
    preds = clf.predict_batch(queries, k=1)
    for p, exp in zip(preds, expected):
        if p and p[0][0] == exp:
            correct += 1
    return correct / len(queries)


@pytest.mark.slow
def test_many_class_new_class_preservation(synth_classifier_factory):
    """41 old classes + 3 new (scaled to 12+3 for CI speed): relative
    old-class accuracy drop ≤ 10% (reference :188-198)."""
    clf = synth_classifier_factory()
    old_labels = [f"intent{i:02d}" for i in range(12)]
    texts = [f"{l}:{j}" for l in old_labels for j in range(6)]
    labels = [l for l in old_labels for _ in range(6)]
    clf.add_examples(texts, labels)

    queries = [f"{l}:99" for l in old_labels]
    acc_before = accuracy(clf, queries, old_labels)
    assert acc_before >= 0.9

    new_labels = ["newA", "newB", "newC"]
    clf.add_examples(
        [f"{l}:{j}" for l in new_labels for j in range(6)],
        [l for l in new_labels for _ in range(6)],
    )
    acc_after = accuracy(clf, queries, old_labels)
    drop = (acc_before - acc_after) / acc_before
    assert drop <= 0.10, f"old-class accuracy dropped {drop:.1%}"
    # new classes are learnable too
    acc_new = accuracy(clf, [f"{l}:99" for l in new_labels], new_labels)
    assert acc_new >= 2 / 3


def test_incremental_single_new_class(synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples(
        [f"a:{i}" for i in range(8)] + [f"b:{i}" for i in range(8)],
        ["a"] * 8 + ["b"] * 8,
    )
    assert clf.predict("a:50")[0][0] == "a"
    clf.add_examples([f"c:{i}" for i in range(8)], ["c"] * 8)
    assert clf.predict("a:50", k=3)[0][0] == "a"
    assert clf.predict("b:50", k=3)[0][0] == "b"
    assert clf.predict("c:50", k=3)[0][0] == "c"


def test_progressive_class_addition(synth_classifier_factory):
    """Add classes one at a time (reference test_ewc.py:156-191 in spirit)."""
    clf = synth_classifier_factory()
    labels = ["u", "v", "w", "x"]
    clf.add_examples([f"u:{i}" for i in range(6)] + [f"v:{i}" for i in range(6)],
                     ["u"] * 6 + ["v"] * 6)
    for new in labels[2:]:
        clf.add_examples([f"{new}:{i}" for i in range(6)], [new] * 6)
    for l in labels:
        assert clf.predict(f"{l}:99", k=4)[0][0] == l, l


@pytest.mark.slow
def test_banking77_scale_scenario(synth_classifier_factory):
    """Banking77-scale: 77 intents, then 3 new ones — the reference's
    flagship continual-learning scenario at its real class count
    (tests/test_new_class_accuracy_preservation.py uses 41+3; the published
    llm-router/Banking77 models run 77)."""
    clf = synth_classifier_factory(class_capacity_buckets=[8, 16, 32, 64, 128],
                                   train_size_buckets=[64, 256, 1024])
    labels = [f"intent{i:02d}" for i in range(77)]
    clf.add_examples(
        [f"{l}:{j}" for l in labels for j in range(4)],
        [l for l in labels for _ in range(4)],
    )
    queries = [f"{l}:99" for l in labels]
    preds = clf.predict_batch(queries, k=1)
    acc_before = np.mean([p[0][0] == l for p, l in zip(preds, labels)])
    assert acc_before >= 0.9, acc_before

    new = ["newA", "newB", "newC"]
    clf.add_examples([f"{l}:{j}" for l in new for j in range(4)],
                     [l for l in new for _ in range(4)])
    preds = clf.predict_batch(queries, k=1)
    acc_after = np.mean([p[0][0] == l for p, l in zip(preds, labels)])
    assert (acc_before - acc_after) / acc_before <= 0.10
    acc_new = np.mean([clf.predict(f"{l}:9", k=1)[0][0] == l for l in new])
    assert acc_new >= 2 / 3
