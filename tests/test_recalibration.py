"""Post-incremental prototype recalibration (deviation #7).

The reference's issue-#53 regime: adding new classes to a trained classifier
drops old-class accuracy >10% (tests/test_new_class_accuracy_preservation.py:
188-198 sets the ≤10% bar).  EWC cannot clear it — the failure is
prototype-softmax renormalization plus a new-class-biased head, not head
drift (docs/architecture.md deviations #6/#7).  The fix is a per-class bias
on the prototype softmax logits fitted on the replay store
(training.fit_proto_bias), applied in every fusion path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adaptive_classifier_tpu import training
from adaptive_classifier_tpu.ops import knn, fusion
from tests.conftest import synthetic_embed


def noisy_embed(texts, dim=128, noise=0.75, seed=1):
    """Overlapping clusters — borderline queries exist, so new prototypes
    can steal them (the regime the calibration is for)."""
    base = synthetic_embed(texts, dim=dim, noise=0.0)
    rng = np.random.default_rng(seed + sum(len(t) for t in texts))
    out = base + noise * rng.standard_normal(base.shape).astype(np.float32)
    return out / np.linalg.norm(out, axis=1, keepdims=True)


@pytest.fixture
def noisy_classifier(tiny_classifier_factory):
    def make(**config):
        clf = tiny_classifier_factory(
            train_size_buckets=[64, 256, 1024], **config)
        clf._get_embeddings = lambda texts: noisy_embed(
            texts, dim=clf.embedding_dim)
        return clf

    return make


def _accuracy(clf, queries, expected):
    preds = clf.predict_batch(queries, k=1)
    return sum(p and p[0][0] == e for p, e in zip(preds, expected)) / len(queries)


def test_zero_bias_is_identity():
    """bias=None and bias=0 produce identical scores in every scoring op."""
    rng = np.random.default_rng(0)
    sims = jnp.asarray(np.abs(rng.standard_normal((4, 8))).astype(np.float32))
    valid = jnp.asarray([True] * 6 + [False] * 2)
    zero = jnp.zeros((8,))
    np.testing.assert_allclose(
        knn.full_scores(sims, valid), knn.full_scores(sims, valid, bias=zero),
        rtol=1e-6)
    s0, i0 = knn.topk_scores(sims, valid, 3)
    s1, i1 = knn.topk_scores(sims, valid, 3, bias=zero)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)
    np.testing.assert_array_equal(i0, i1)


def test_bias_shifts_full_scores_toward_biased_class():
    sims = jnp.ones((1, 4))
    valid = jnp.asarray([True, True, True, False])
    bias = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    scores = np.asarray(knn.full_scores(sims, valid, bias=bias))[0]
    assert scores[0] > scores[1] == scores[2]
    assert scores[3] == 0.0
    assert abs(scores.sum() - 1.0) < 1e-5


def test_fit_proto_bias_recovers_miscalibrated_store():
    """A class whose prototype sims are systematically depressed gets a
    positive bias, and balanced train accuracy improves."""
    rng = np.random.default_rng(0)
    N, C = 96, 6
    labels = jnp.asarray(rng.integers(0, 3, N), jnp.int32)
    onehot = np.eye(C, dtype=np.float32)[np.asarray(labels)]
    sims = jnp.asarray(
        0.4 * onehot + 0.3 + 0.05 * rng.standard_normal((N, C)).astype(np.float32))
    # depress class 0's similarity so it always loses narrowly
    sims = sims.at[:, 0].add(jnp.where(labels == 0, -0.45, 0.0))
    valid = jnp.asarray([True] * 3 + [False] * 3)
    active = valid
    vmask = jnp.ones((N,), bool)
    pw = jnp.full((C,), 0.7)
    hw = 1.0 - pw
    logits = jnp.zeros((N, C))

    def balanced_acc(bias):
        scores = np.asarray(knn.full_scores(sims, valid, bias=bias))
        pred = scores.argmax(1)
        accs = [np.mean(pred[np.asarray(labels) == c] == c) for c in range(3)]
        return float(np.mean(accs))

    before = balanced_acc(None)
    bias, loss = training.fit_proto_bias(
        sims, logits, labels, vmask, valid, active, pw, hw,
        has_head=False, steps=300)
    after = balanced_acc(bias)
    assert after > before
    assert float(bias[0]) > 0.1          # depressed class lifted
    assert float(np.abs(np.asarray(bias)[3:]).max()) == 0.0  # invalid slots 0


def test_incremental_recalibration_improves_old_class_accuracy(noisy_classifier):
    """On overlapping clusters, recalibration-on preserves old-class accuracy
    at least as well as recalibration-off, and keeps the fitted bias active
    in predict/predict_batch (issue-#53 regime)."""
    accs = {}
    for recal in (False, True):
        clf = noisy_classifier(prototype_recalibration=recal)
        old = [f"old{i}" for i in range(8)]
        clf.add_examples([f"{l}:{j}" for l in old for j in range(8)],
                         [l for l in old for _ in range(8)])
        queries = [f"{l}:q{j}" for l in old for j in range(4)]
        expected = [l for l in old for _ in range(4)]
        before = _accuracy(clf, queries, expected)
        clf.add_examples([f"new{i}:{j}" for i in range(3) for j in range(8)],
                         [f"new{i}" for i in range(3) for _ in range(8)])
        after = _accuracy(clf, queries, expected)
        accs[recal] = (before, after)
        if recal:
            assert clf._proto_bias is not None
            assert clf._proto_bias_arr() is not None
        else:
            assert clf._proto_bias is None
    drop_off = accs[False][0] - accs[False][1]
    drop_on = accs[True][0] - accs[True][1]
    assert drop_on <= drop_off + 1e-9, (accs, drop_off, drop_on)


def test_recalibration_keeps_new_class_learnable(noisy_classifier):
    clf = noisy_classifier(prototype_recalibration=True)
    old = [f"o{i}" for i in range(6)]
    clf.add_examples([f"{l}:{j}" for l in old for j in range(8)],
                     [l for l in old for _ in range(8)])
    clf.add_examples([f"fresh:{j}" for j in range(8)], ["fresh"] * 8)
    acc_new = _accuracy(clf, [f"fresh:q{j}" for j in range(6)], ["fresh"] * 6)
    assert acc_new >= 0.5


def test_bias_persistence_roundtrip(noisy_classifier, tmp_path):
    clf = noisy_classifier(prototype_recalibration=True)
    clf.add_examples([f"a:{i}" for i in range(8)] + [f"b:{i}" for i in range(8)],
                     ["a"] * 8 + ["b"] * 8)
    clf.add_examples([f"c:{i}" for i in range(8)], ["c"] * 8)
    assert clf._proto_bias is not None
    clf.save(str(tmp_path / "ckpt"), include_onnx=False)

    from adaptive_classifier_tpu import AdaptiveClassifier

    loaded = AdaptiveClassifier.load(str(tmp_path / "ckpt"))
    assert loaded._proto_bias is not None
    np.testing.assert_allclose(loaded._proto_bias, clf._proto_bias, rtol=1e-6)


def test_clear_memory_resets_bias(noisy_classifier):
    clf = noisy_classifier(prototype_recalibration=True)
    clf.add_examples([f"a:{i}" for i in range(8)] + [f"b:{i}" for i in range(8)],
                     ["a"] * 8 + ["b"] * 8)
    clf.add_examples([f"c:{i}" for i in range(8)], ["c"] * 8)
    assert clf._proto_bias is not None
    clf.clear_memory()
    assert clf._proto_bias is None
