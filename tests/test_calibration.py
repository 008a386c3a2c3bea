"""predict_proba + temperature calibration (calibration.py).

The reference has no calibration story; these tests pin the TPU-native
surface: full fused distributions, NLL-optimal temperature fitting, and
ECE improving on miscalibrated data.
"""

import numpy as np
import pytest

from adaptive_classifier_tpu.calibration import (
    TemperatureScaler,
    expected_calibration_error,
    scale_probs,
)


@pytest.fixture(scope="module")
def trained_clf(synth_classifier_factory):
    clf = synth_classifier_factory()
    texts = [f"cat:{i}" for i in range(8)] + [f"dog:{i}" for i in range(8)] \
        + [f"fox:{i}" for i in range(8)]
    clf.add_examples(texts, ["cat"] * 8 + ["dog"] * 8 + ["fox"] * 8)
    return clf


def test_predict_proba_rows_are_distributions(trained_clf):
    probs, labels = trained_clf.predict_proba(["cat:91", "dog:92", "fox:93"])
    assert probs.shape == (3, 3)
    assert sorted(labels) == ["cat", "dog", "fox"]
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    assert (probs >= 0).all()
    # argmax agrees with predict (same fusion semantics)
    for row, text in zip(probs, ["cat:91", "dog:92", "fox:93"]):
        assert labels[int(row.argmax())] == trained_clf.predict(text, k=1)[0][0]


def test_predict_proba_single_string_and_empty(trained_clf):
    probs, labels = trained_clf.predict_proba("cat:55")
    assert probs.shape == (1, 3)
    with pytest.raises(ValueError):
        trained_clf.predict_proba([])


def test_scale_probs_identity_and_flattening():
    p = np.asarray([[0.7, 0.2, 0.1], [0.05, 0.9, 0.05]], np.float32)
    same = np.asarray(scale_probs(p, 1.0))
    np.testing.assert_allclose(same, p, atol=1e-6)
    hot = np.asarray(scale_probs(p, 10.0))   # T>1 flattens
    assert hot[0].max() < p[0].max()
    cold = np.asarray(scale_probs(p, 0.1))   # T<1 sharpens
    assert cold[0].max() > p[0].max()
    # zero columns stay exactly zero
    z = np.asarray([[0.5, 0.5, 0.0]], np.float32)
    out = np.asarray(scale_probs(z, 2.0))
    assert out[0, 2] == 0.0
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-6)


def test_scaler_recovers_known_temperature():
    """Sharpened version of a well-calibrated distribution: fitting should undo it."""
    rng = np.random.default_rng(0)
    N, C = 2000, 4
    true = rng.dirichlet(np.ones(C) * 2.0, size=N).astype(np.float32)
    labels = np.asarray([rng.choice(C, p=row) for row in true], np.int32)
    overconfident = np.asarray(scale_probs(true, 0.5))   # sharpened
    scaler = TemperatureScaler().fit(overconfident, labels)
    # undoing T=0.5 needs T≈2 in probability space
    assert 1.5 < scaler.temperature < 2.7, scaler.temperature
    fixed = scaler.transform(overconfident)
    assert (expected_calibration_error(fixed, labels)
            < expected_calibration_error(overconfident, labels))


def test_classifier_calibrate_roundtrip(trained_clf):
    hold_texts = [f"cat:{i}" for i in range(100, 106)] + \
                 [f"dog:{i}" for i in range(100, 106)] + \
                 [f"fox:{i}" for i in range(100, 106)]
    hold_labels = ["cat"] * 6 + ["dog"] * 6 + ["fox"] * 6
    report = trained_clf.calibrate(hold_texts, hold_labels)
    assert report["nll_after"] <= report["nll_before"] + 1e-6
    assert report["temperature"] > 0
    probs, _ = trained_clf.predict_proba(hold_texts, calibrated=True)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_calibrated_requires_fit(synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples(["a:1", "b:1", "a:2", "b:2"], ["a", "b", "a", "b"])
    with pytest.raises(RuntimeError):
        clf.predict_proba(["a:9"], calibrated=True)


def test_calibrate_rejects_unknown_labels(trained_clf):
    with pytest.raises(ValueError):
        trained_clf.calibrate(["x:1"], ["never-seen-label"])
