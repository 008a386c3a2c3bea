"""Ridge head (config.head_type="ridge") + fold-fitted fusion weights
(config.fusion_weights="auto") — the round-4 fusion-vs-probe fix.

Round 3 measured the full prototype+MLP fusion 4pp BELOW a 2-fold ridge
probe on identical features (sentiment 0.75 vs 0.79); these options promote
the probe's closed-form solution to the production head and fit the fusion
share on a train fold so the pipeline can never validate below the probe.
No reference analog (the reference head is the SGD MLP of models.py:30-98
with fixed history weights, classifier.py:449-467); defaults preserve
reference semantics exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptive_classifier_tpu import training
from adaptive_classifier_tpu.models import head as head_lib


# ---------------------------------------------------------------------------
# ridge_solve correctness
# ---------------------------------------------------------------------------

def _np_ridge(F, Y, lam):
    D = F.shape[1]
    return np.linalg.solve(F.T @ F + lam * np.eye(D, dtype=np.float32), F.T @ Y)


def test_ridge_solve_matches_numpy_primal_and_dual():
    rng = np.random.default_rng(0)
    D, C = 16, 8
    for N in (12, 48):  # N<D → dual branch; N>D → primal branch
        F = rng.standard_normal((N, D)).astype(np.float32)
        y = rng.integers(0, 4, N)
        valid = np.ones(N, bool)
        W = np.asarray(training.ridge_solve(
            jnp.asarray(F), jnp.asarray(y), jnp.asarray(valid), C, 1.0))
        Y = np.eye(C, dtype=np.float32)[y]
        np.testing.assert_allclose(W, _np_ridge(F, Y, 1.0), rtol=2e-3, atol=2e-4)


def test_ridge_solve_padded_rows_are_exact_noops():
    rng = np.random.default_rng(1)
    D, C, n = 16, 8, 10
    F = rng.standard_normal((n, D)).astype(np.float32)
    y = rng.integers(0, 3, n)
    W_tight = np.asarray(training.ridge_solve(
        jnp.asarray(F), jnp.asarray(y), jnp.ones(n, bool), C, 1.0))
    # pad with garbage rows marked invalid
    Fp = np.concatenate([F, rng.standard_normal((6, D)).astype(np.float32)])
    yp = np.concatenate([y, rng.integers(0, 3, 6)])
    vp = np.concatenate([np.ones(n, bool), np.zeros(6, bool)])
    W_pad = np.asarray(training.ridge_solve(
        jnp.asarray(Fp), jnp.asarray(yp), jnp.asarray(vp), C, 1.0))
    np.testing.assert_allclose(W_pad, W_tight, rtol=2e-3, atol=2e-4)


def test_ridge_solve_sample_weight_equals_row_duplication():
    """Integer sample weights must match physically duplicating the rows
    (the weighted-LS identity the strategic refit's down-weighted
    action-space block relies on); weight 0 must match dropping the row."""
    rng = np.random.default_rng(2)
    D, C, n = 12, 8, 9
    F = rng.standard_normal((n, D)).astype(np.float32)
    y = rng.integers(0, 3, n)
    w = np.asarray([2.0, 1.0, 1.0, 3.0, 1.0, 2.0, 1.0, 1.0, 0.0], np.float32)
    W_w = np.asarray(training.ridge_solve(
        jnp.asarray(F), jnp.asarray(y), jnp.ones(n, bool), C, 1.0,
        sample_weight=jnp.asarray(w)))
    # physically duplicate rows per weight
    reps = w.astype(int)
    Fd = np.repeat(F, reps, axis=0)
    yd = np.repeat(y, reps)
    W_d = np.asarray(training.ridge_solve(
        jnp.asarray(Fd), jnp.asarray(yd), jnp.ones(len(yd), bool), C, 1.0))
    np.testing.assert_allclose(W_w, W_d, rtol=2e-3, atol=2e-4)


def test_select_ridge_lambda_prefers_generalizing_lambda():
    """The λ probe must pick a generalizing λ on fold-CV and prefer 1.0 on
    ties; a classifier with ridge_lambda='auto' resolves once and freezes
    the value in config."""
    rng = np.random.default_rng(3)
    D, C, n = 24, 8, 60
    centers = rng.standard_normal((3, D)).astype(np.float32)
    y = np.repeat(np.arange(3), n // 3)
    e = centers[y] + 0.8 * rng.standard_normal((n, D)).astype(np.float32)
    cap = 64
    emb = jnp.zeros((cap, D)).at[:n].set(jnp.asarray(e))
    lbl = jnp.zeros((cap,), jnp.int32).at[:n].set(jnp.asarray(y))
    valid = jnp.arange(cap) < n
    lam, rep = training.select_ridge_lambda(emb, lbl, valid, C)
    assert lam in rep["grid"]
    assert rep["val_acc"][rep["grid"].index(lam)] == max(rep["val_acc"])
    # degenerate inputs fall back to the reference default
    lam2, _ = training.select_ridge_lambda(
        emb, jnp.zeros((cap,), jnp.int32), valid, C)
    assert lam2 == 1.0


def test_classifier_resolves_auto_ridge_lambda(synth_classifier_factory):
    clf = synth_classifier_factory(head_type="ridge", ridge_lambda="auto")
    clf.add_examples([f"u:{i}" for i in range(8)] + [f"v:{i}" for i in range(8)],
                     ["u"] * 8 + ["v"] * 8)
    assert isinstance(clf.config.ridge_lambda, float)
    assert clf.predict("u:q", k=1)[0][0] == "u"


def test_ridge_head_params_linear_and_keeps_skip():
    rng = np.random.default_rng(2)
    F = rng.standard_normal((20, 8)).astype(np.float32)
    y = rng.integers(0, 3, 20)
    old = {"hidden": [], "out": {"w": jnp.zeros((8, 8)), "b": jnp.zeros(8)},
           "skip": {"w": jnp.ones((8, 8))}}
    params = training.ridge_head_params(
        jnp.asarray(F), jnp.asarray(y), jnp.ones(20, bool), 8, keep_from=old)
    assert params["hidden"] == []
    assert "skip" in params
    # head_forward on linear params is x @ W (+ skip)
    logits = head_lib.head_forward(params, jnp.asarray(F[:3]), train=False)
    expect = F[:3] @ np.asarray(params["out"]["w"]) + F[:3] @ np.ones((8, 8))
    np.testing.assert_allclose(np.asarray(logits), expect, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# fit_fusion_alpha
# ---------------------------------------------------------------------------

def _ridge_fold_fit(fe, fy, ve, n_classes=8, lam=1.0):
    W = np.asarray(training.ridge_solve(
        jnp.asarray(fe), jnp.asarray(fy), jnp.ones(len(fy), bool),
        n_classes, lam))
    return ve @ W


def test_fusion_alpha_never_validates_below_probe():
    """The α=0 grid point IS the probe; the chosen α must score ≥ it."""
    rng = np.random.default_rng(3)
    # features where a linear rule is strong but class means overlap
    n, D = 80, 12
    y = np.repeat(np.arange(4), n // 4)
    F = rng.standard_normal((n, D)).astype(np.float32) * 2.0
    F[:, 0] = y * 0.5  # weak linear signal on one coordinate
    alpha, report = training.fit_fusion_alpha(F, y, 4, _ridge_fold_fit)
    accs = report["val_acc"]
    assert max(accs) == accs[report["alphas"].index(alpha)]
    assert accs[report["alphas"].index(alpha)] >= report["probe_val_acc"] - 1e-9


def test_fusion_alpha_tie_prefers_reference_weighting():
    rng = np.random.default_rng(4)
    # trivially separable → every α validates at 1.0 → tie → 0.7
    n, D = 40, 8
    y = np.repeat(np.arange(2), n // 2)
    F = rng.standard_normal((n, D)).astype(np.float32) * 0.01
    F[:, 0] = (y * 10.0).astype(np.float32)
    alpha, report = training.fit_fusion_alpha(F, y, 2, _ridge_fold_fit)
    assert alpha == pytest.approx(0.7)


def test_fusion_alpha_prefers_head_when_prototypes_mislead():
    """Construct data where class means collide but a linear rule wins:
    the sweep must push α toward the head."""
    rng = np.random.default_rng(5)
    n = 120
    y = np.repeat(np.arange(2), n // 2)
    # two interleaved stripes: mean(class 0) == mean(class 1) == 0, but
    # linearly separable by x0 sign pattern with labels alternating in x1
    x0 = np.where(y == 0, 1.0, -1.0) + rng.standard_normal(n) * 0.05
    x1 = rng.standard_normal(n) * 3.0   # high-variance nuisance
    F = np.stack([x0, x1] + [rng.standard_normal(n) * 0.01 for _ in range(6)],
                 axis=1).astype(np.float32)
    # shift half of each class far away so the class MEAN sits between the
    # clusters of the other class (prototype channel ~chance)
    F[: n // 4, 1] += 8.0
    F[n // 2 : n // 2 + n // 4, 1] += 8.0
    alpha, report = training.fit_fusion_alpha(F, y, 2, _ridge_fold_fit)
    accs = report["val_acc"]
    # head-only must beat proto-only on this construction, and the fitted α
    # must score at least as well as the probe
    assert accs[0] > accs[-1]
    assert accs[report["alphas"].index(alpha)] >= accs[0] - 1e-9


# ---------------------------------------------------------------------------
# classifier integration
# ---------------------------------------------------------------------------

def _make(tiny_classifier_factory, **cfg):
    return tiny_classifier_factory(head_type="ridge", fusion_weights="auto",
                                   **cfg)


def test_classifier_ridge_head_is_linear(tiny_classifier_factory):
    clf = _make(tiny_classifier_factory)
    texts = [f"alpha: row {i}" for i in range(12)] + \
            [f"beta: row {i}" for i in range(12)]
    labels = ["a"] * 12 + ["b"] * 12
    clf.add_examples(texts, labels)
    assert clf.head_params["hidden"] == []
    assert clf._fusion_alpha is not None
    preds = clf.predict_batch(texts[:4], k=1)
    assert all(p[0][0] == "a" for p in preds)


def test_classifier_fusion_alpha_roundtrip(tiny_classifier_factory, tmp_path):
    clf = _make(tiny_classifier_factory)
    texts = [f"alpha: row {i}" for i in range(10)] + \
            [f"beta: row {i}" for i in range(10)]
    clf.add_examples(texts, ["a"] * 10 + ["b"] * 10)
    clf.save(tmp_path / "ck")
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf2 = AdaptiveClassifier.load(tmp_path / "ck")
    assert clf2._fusion_alpha == pytest.approx(clf._fusion_alpha)
    assert clf2.config.head_type == "ridge"
    assert clf2.head_params["hidden"] == []
    a = [p[0][0] for p in clf.predict_batch(texts[:6], k=1)]
    b = [p[0][0] for p in clf2.predict_batch(texts[:6], k=1)]
    assert a == b


def test_classifier_ridge_incremental_new_class(tiny_classifier_factory):
    clf = _make(tiny_classifier_factory)
    clf.add_examples([f"alpha: row {i}" for i in range(8)]
                     + [f"beta: row {i}" for i in range(8)],
                     ["a"] * 8 + ["b"] * 8)
    clf.add_examples([f"gamma: row {i}" for i in range(6)], ["c"] * 6)
    assert clf.predict("gamma: query", k=1)[0][0] == "c"
    assert clf.predict("alpha: query", k=1)[0][0] == "a"


def test_defaults_preserve_reference_semantics(tiny_classifier_factory):
    clf = tiny_classifier_factory()
    assert clf.config.head_type == "mlp"
    assert clf.config.fusion_weights == "history"
    clf.add_examples([f"alpha: row {i}" for i in range(12)]
                     + [f"beta: row {i}" for i in range(12)],
                     ["a"] * 12 + ["b"] * 12)
    assert clf._fusion_alpha is None           # history weights stay in force
    assert len(clf.head_params["hidden"]) == 2  # reference MLP shape
