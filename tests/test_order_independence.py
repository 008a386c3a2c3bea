"""Order-independence regression (reference analog:
tests/test_order_independence.py — alphabetical label-ID assignment, bounded
prediction swing across insertion orders)."""

import numpy as np

from tests.conftest import synthetic_embed


def make(synth_classifier_factory):
    return synth_classifier_factory()


def test_label_ids_independent_of_insertion_order(synth_classifier_factory):
    a = synth_classifier_factory()
    a.add_examples(["zeta:1", "alpha:1", "mid:1"], ["zeta", "alpha", "mid"])
    b = synth_classifier_factory()
    b.add_examples(["mid:1", "zeta:1", "alpha:1"], ["mid", "zeta", "alpha"])
    assert a.label_to_id == b.label_to_id == {"alpha": 0, "mid": 1, "zeta": 2}


def test_label_ids_stable_across_batches(synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples(["b:1"], ["bravo"])
    clf.add_examples(["a:1"], ["alpha"])  # later arrival gets the next id
    assert clf.label_to_id == {"bravo": 0, "alpha": 1}


def test_prediction_swing_bounded_across_orders(synth_classifier_factory):
    """Same data in different orders → same top-1 and bounded score swing
    (<0.4 like the reference's threshold, test_order_independence.py:55-116)."""
    texts_a = [f"cat:{i}" for i in range(8)]
    texts_b = [f"dog:{i}" for i in range(8)]
    labels_a, labels_b = ["cat"] * 8, ["dog"] * 8

    c1 = synth_classifier_factory()
    c1.add_examples(texts_a + texts_b, labels_a + labels_b)
    c2 = synth_classifier_factory()
    c2.add_examples(texts_b + texts_a, labels_b + labels_a)

    for q in ["cat:99", "dog:99"]:
        p1 = dict(c1.predict(q, k=2))
        p2 = dict(c2.predict(q, k=2))
        top1 = max(p1, key=p1.get)
        top2 = max(p2, key=p2.get)
        assert top1 == top2
        for label in p1:
            assert abs(p1[label] - p2.get(label, 0.0)) < 0.4
