"""Strategic classification tests (reference analog: strategic.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_batched_strategic_predicts_match_singles(synth_classifier_factory):
    """predict_robust/_predict_dual delegate to the batched forms; the
    batched sweep over N texts must agree with per-text calls (robust and
    regular paths are deterministic; the dual path shares one candidate
    key per call, so compare structure + the deterministic rows)."""
    clf = synth_classifier_factory(config={
        "enable_strategic_mode": True,
        "cost_function_type": "linear",
        "cost_coefficients": [0.1] * 128,
    })
    clf.add_examples([f"alpha:{i}" for i in range(6)] + [f"beta:{i}" for i in range(6)],
                     ["alpha"] * 6 + ["beta"] * 6)
    texts = ["alpha:q1", "beta:q2", "alpha:q3"]
    batched = clf.predict_robust_batch(texts, 2)
    singles = [clf.predict_robust(t, 2) for t in texts]
    assert [[l for l, _ in row] for row in batched] == \
        [[l for l, _ in row] for row in singles]
    for row_b, row_s in zip(batched, singles):
        for (lb, sb), (ls, ss) in zip(row_b, row_s):
            assert abs(sb - ss) < 1e-5
    dual = clf._predict_dual_batch(texts, 2)
    assert len(dual) == 3 and all(len(r) == 2 for r in dual)
    strat = clf.predict_strategic_batch(texts, 2)
    assert len(strat) == 3 and all(r for r in strat)
import pytest

from adaptive_classifier_tpu.strategic import (
    CostFunctionFactory, LinearCostFunction, SeparableCostFunction,
    StrategicEvaluator, StrategicOptimizer,
)
from tests.conftest import synthetic_embed

D = 8


def test_separable_cost():
    c = SeparableCostFunction(np.ones(D, np.float32) * 0.5, np.ones(D, np.float32) * 0.5)
    x = np.zeros(D, np.float32)
    y = np.ones(D, np.float32)
    # c2·y − c1·x = 4 − 0
    assert float(c.compute_cost(x, y)) == pytest.approx(4.0)
    # moving "down" costs nothing (max with 0)
    assert float(c.compute_cost(y, x)) == 0.0


def test_linear_cost():
    c = LinearCostFunction(np.ones(D, np.float32))
    x = np.zeros(D, np.float32)
    y = np.full(D, 0.25, np.float32)
    assert float(c.compute_cost(x, y)) == pytest.approx(2.0)
    assert float(c.compute_cost(y, x)) == 0.0


def test_dict_coefficients_require_feature_names():
    with pytest.raises(ValueError):
        SeparableCostFunction({"f0": 1.0}, {"f0": 1.0})
    c = SeparableCostFunction({"f0": 1.0}, {"f0": 2.0}, feature_names=["f0", "f1"])
    assert np.asarray(c.c1).tolist() == [1.0, 0.0]
    assert np.asarray(c.c2).tolist() == [2.0, 0.0]


def test_factory():
    c = CostFunctionFactory.create_cost_function("linear", np.ones(D, np.float32))
    assert isinstance(c, LinearCostFunction)
    c = CostFunctionFactory.create_cost_function("separable", np.ones(D, np.float32))
    assert isinstance(c, SeparableCostFunction)
    with pytest.raises(ValueError):
        CostFunctionFactory.create_cost_function("bogus", np.ones(D, np.float32))


def test_candidate_sweep_semantics():
    """Candidates: x itself + per-feature ±2 sweeps truncated to 50
    (reference strategic.py:104-123)."""
    c = SeparableCostFunction(np.ones(D, np.float32), np.ones(D, np.float32))
    x = jnp.zeros((1, D))
    cands = np.asarray(c._generate_candidates(x))[0]
    assert cands.shape == (50, D)
    np.testing.assert_array_equal(cands[0], np.zeros(D))
    # candidate 1 perturbs feature 0 by -2.0
    assert cands[1][0] == pytest.approx(-2.0)
    assert (cands[1][1:] == 0).all()
    # candidate 11 perturbs feature 1
    assert cands[11][1] == pytest.approx(-2.0)


def test_best_response_improves_utility():
    cost = SeparableCostFunction(np.full(D, 0.05, np.float32), np.full(D, 0.05, np.float32))

    def f(z):  # prefers large feature 0
        p1 = jax.nn.sigmoid(z[:, 0])
        return jnp.stack([1 - p1, p1], axis=-1)

    x = jnp.zeros((3, D))
    br = cost.compute_best_response_batch(x, f)
    assert br.shape == (3, D)
    u_orig = np.asarray(jnp.max(f(x), -1))
    u_new = np.asarray(jnp.max(f(br), -1)) - np.asarray(
        jax.vmap(lambda a, b: cost.compute_cost(a, b))(x, br)
    )
    assert (u_new >= u_orig - 1e-6).all()
    # utility is max-prob − cost: moving feature 0 (either direction) raises
    # the max class probability above the 0.5 tie at x=0, so the agent moves
    assert (np.abs(np.asarray(br)[:, 0]) > 0).all()


def test_best_response_single_sample_api():
    cost = LinearCostFunction(np.full(D, 0.1, np.float32))

    def f(z):
        return jnp.ones((z.shape[0], 2)) * 0.5

    x = np.zeros(D, np.float32)
    br = cost.compute_best_response(x, f)
    assert np.asarray(br).shape == (D,)
    # uniform classifier → no gain from moving → stays at x (zero cost beats any positive cost)
    np.testing.assert_allclose(np.asarray(br), x, atol=1e-6)


def test_strategic_loss_components():
    cost = SeparableCostFunction(np.full(D, 0.01, np.float32), np.full(D, 0.01, np.float32))
    opt = StrategicOptimizer(cost)
    w = jnp.asarray(np.random.default_rng(0).standard_normal((D, 2)), jnp.float32)

    def forward(z):
        return z @ w

    x = jnp.asarray(np.random.default_rng(1).standard_normal((6, D)), jnp.float32)
    y = jnp.asarray(np.array([0, 1, 0, 1, 0, 1]))
    regular, penalty = opt.strategic_loss_terms(forward, x, y, key=jax.random.PRNGKey(0))
    total = opt.strategic_loss(forward, x, y, strategic_lambda=0.5, key=jax.random.PRNGKey(0))
    assert float(penalty) >= 0
    assert float(total) == pytest.approx(float(regular) + 0.5 * float(penalty), rel=1e-5)


def test_evaluator_keys_and_monotonicity():
    cost = SeparableCostFunction(np.full(D, 0.01, np.float32), np.full(D, 0.01, np.float32))
    ev = StrategicEvaluator(cost)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((40, D)), jnp.float32)
    w = jnp.asarray(r.standard_normal((D, 2)), jnp.float32)
    y = jnp.asarray((np.asarray(x) @ np.asarray(w)).argmax(-1))

    def forward(z):
        return z @ w

    res = ev.evaluate_robustness(forward, x, y, gaming_levels=[0.0, 1.0])
    assert set(res) >= {"accuracy_gaming_0.0", "accuracy_gaming_1.0",
                        "robustness_score", "relative_robustness"}
    assert res["accuracy_gaming_0.0"] == pytest.approx(1.0)
    assert res["robustness_score"] == pytest.approx(
        res["accuracy_gaming_0.0"] - res["accuracy_gaming_1.0"])


@pytest.fixture(scope="module")
def strategic_clf():
    from adaptive_classifier_tpu import AdaptiveClassifier

    cfg = {
        "train_size_buckets": [64, 256],
        "class_capacity_buckets": [8],
        "example_capacity_buckets": [32, 128],
        "enable_strategic_mode": True,
        "cost_function_type": "linear",
        "cost_coefficients": {"feature_cost": 0.5},
        "strategic_training_frequency": 1000,  # keep unit runs fast
    }
    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config=cfg)
    clf._get_embeddings = lambda texts: synthetic_embed(texts, dim=clf.embedding_dim)
    clf.add_examples(
        [f"ok:{i}" for i in range(6)] + [f"spam:{i}" for i in range(6)],
        ["ok"] * 6 + ["spam"] * 6,
    )
    return clf


def test_classifier_strategic_mode_enabled(strategic_clf):
    assert strategic_clf.strategic_mode
    assert strategic_clf.strategic_optimizer is not None


def test_predict_dual_blend(strategic_clf):
    preds = strategic_clf.predict("ok:99", k=2)
    assert len(preds) == 2
    assert abs(sum(s for _, s in preds) - 1.0) < 1e-4


def test_predict_strategic_and_robust(strategic_clf):
    ps = strategic_clf.predict_strategic("ok:99", k=2)
    pr = strategic_clf.predict_robust("ok:99", k=2)
    assert len(ps) == 2 and len(pr) == 2
    assert abs(sum(s for _, s in ps) - 1.0) < 1e-4
    assert abs(sum(s for _, s in pr) - 1.0) < 1e-4


def test_evaluate_strategic_robustness_api(strategic_clf):
    res = strategic_clf.evaluate_strategic_robustness(
        ["ok:1", "spam:1", "ok:2", "spam:2"], ["ok", "spam", "ok", "spam"],
        gaming_levels=[0.0, 1.0],
    )
    assert "robustness_score" in res


def test_strategic_training_step_runs(strategic_clf):
    before = jax.tree.leaves(strategic_clf.head_params)[0]
    strategic_clf._perform_strategic_training()
    after = jax.tree.leaves(strategic_clf.head_params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_non_strategic_classifier_raises_on_eval(synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples(["a:1", "b:1"], ["a", "b"])
    with pytest.raises(ValueError):
        clf.evaluate_strategic_robustness(["a:1"], ["a"])


def test_periodic_strategic_training_trigger():
    """Strategic training fires when train_steps hits the configured
    frequency (classifier.py:196-197)."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config={
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32],
        "enable_strategic_mode": True,
        "cost_function_type": "linear",
        "cost_coefficients": {"c": 0.5},
        "strategic_training_frequency": 1,  # fire on every add
    })
    clf._get_embeddings = lambda texts: synthetic_embed(texts, dim=clf.embedding_dim)
    calls = []
    original = clf._perform_strategic_training
    clf._perform_strategic_training = lambda: calls.append(1) or original()
    clf.add_examples(["a:1", "b:1", "a:2", "b:2"], ["a", "b", "a", "b"])
    assert calls, "strategic training did not trigger at frequency=1"


@pytest.fixture(scope="module")
def strategic_ridge_clf(synth_classifier_factory):
    clf = synth_classifier_factory(
        head_type="ridge", fusion_weights="auto",
        enable_strategic_mode=True, cost_function_type="linear",
        cost_coefficients=[0.15] * 128, strategic_training_frequency=1)
    clf.add_examples(
        [f"cls{i}:{j}" for i in range(3) for j in range(8)],
        [f"cls{i}" for i in range(3) for _ in range(8)])
    return clf


def _br_flips(clf, texts, labels):
    """Best-response flip count of clf's own head on the given rows under
    the classifier's trained cost model — the gaming-protocol failure mode
    counted directly."""
    emb = jnp.asarray(clf._get_embeddings(texts))
    y = np.asarray([clf.label_to_id[l] for l in labels])
    logits_fn = clf._masked_logits_fn()
    br = clf.strategic_cost_function.compute_best_response_batch(
        emb, lambda z: jax.nn.softmax(logits_fn(z), axis=-1),
        key=jax.random.PRNGKey(0))
    clean = np.asarray(jnp.argmax(logits_fn(emb), axis=-1))
    gamed = np.asarray(jnp.argmax(logits_fn(br), axis=-1))
    return int(np.sum((gamed != clean))), clean, gamed


def test_strategic_ridge_head_is_br_invariant(strategic_ridge_clf):
    """The strategic-aware ridge refit (classifier._strategic_ridge_refit)
    must produce a head whose prediction cannot be changed by the cost
    model's best response — on stored rows AND on fresh queries (the
    round-4 failure was exactly fresh-point flips: an interpolating ridge
    head has no train flips while test points still flip)."""
    clf = strategic_ridge_clf
    train_texts = [f"cls{i}:{j}" for i in range(3) for j in range(8)]
    train_labels = [f"cls{i}" for i in range(3) for _ in range(8)]
    flips, _, _ = _br_flips(clf, train_texts, train_labels)
    assert flips == 0
    fresh = [f"cls{i}:q{j}" for i in range(3) for j in range(6)]
    fresh_l = [f"cls{i}" for i in range(3) for _ in range(6)]
    flips, _, _ = _br_flips(clf, fresh, fresh_l)
    assert flips == 0


def test_strategic_ridge_defense_survives_refit(strategic_ridge_clf):
    """Every ridge retrain re-runs the strategic-aware solve, so adding
    examples (which rebuilds the head from scratch, reference
    classifier.py:1428) cannot wipe the defense — unlike SGD strategic
    training, which the next closed-form refit replaced (round-4 weak #2)."""
    clf = strategic_ridge_clf
    clf.add_examples([f"cls0:n{i}" for i in range(4)], ["cls0"] * 4)
    fresh = [f"cls{i}:r{j}" for i in range(3) for j in range(6)]
    fresh_l = [f"cls{i}" for i in range(3) for _ in range(6)]
    flips, _, _ = _br_flips(clf, fresh, fresh_l)
    assert flips == 0


def test_strategic_ridge_keeps_clean_accuracy(strategic_ridge_clf,
                                              synth_classifier_factory):
    """The augmented solve must not cost clean accuracy vs plain ridge on
    the same data (round-4's dual blend cost 6.5pp clean for nothing)."""
    plain = synth_classifier_factory(head_type="ridge", fusion_weights="auto")
    plain.add_examples(
        [f"cls{i}:{j}" for i in range(3) for j in range(8)],
        [f"cls{i}" for i in range(3) for _ in range(8)])
    fresh = [f"cls{i}:q{j}" for i in range(3) for j in range(6)]
    fresh_l = [f"cls{i}" for i in range(3) for _ in range(6)]

    def acc(c):
        # dual blend for the strategic arm — predict()'s real semantics
        preds = (c._predict_dual_batch(fresh, 1) if c.strategic_mode
                 else c._predict_regular_batch(fresh, 1))
        return np.mean([p[0][0] == l for p, l in zip(preds, fresh_l)])

    assert acc(strategic_ridge_clf) >= acc(plain) - 1e-9


def test_perform_strategic_training_noop_on_ridge(strategic_ridge_clf):
    """SGD strategic training is folded into the ridge refit; the periodic
    pass must not touch a ridge head (it would be wiped anyway)."""
    before = jax.tree.leaves(strategic_ridge_clf.head_params)
    strategic_ridge_clf._perform_strategic_training()
    after = jax.tree.leaves(strategic_ridge_clf.head_params)
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_typo_variant_deterministic_per_text():
    from adaptive_classifier_tpu.classifier import AdaptiveClassifier as AC

    t = "this film was absolutely wonderful and heartwarming"
    v1 = AC._typo_variant(t, 42)
    v2 = AC._typo_variant(t, 42)
    assert v1 == v2
    assert v1 != AC._typo_variant(t, 43)          # seed-dependent
    # a generic filler suffix is appended (suffix-invariance training)
    assert any(v1.endswith(f) for f in AC._AUG_FILLERS)
    # the original words only mutate by in-word character swaps: same word
    # count and lengths before the appended suffix
    n_words = len(t.split(" "))
    body = v1.split(" ")[:n_words]
    assert [len(w) for w in body] == [len(w) for w in t.split(" ")]
    # short words are never typo'd
    assert AC._typo_variant("hi", 42).split(" , ")[0] == "hi"


def test_head_typo_augment_trains_on_augmented_rows(synth_classifier_factory):
    """head_typo_augment=True adds label-preserving typo'd-copy rows to the
    head fit only — memory/prototypes stay reference-exact."""
    texts = [f"alpha:{i}" for i in range(6)] + [f"beta:{i}" for i in range(6)]
    labels = ["alpha"] * 6 + ["beta"] * 6
    plain = synth_classifier_factory(head_type="ridge")
    plain.add_examples(texts, labels)
    aug = synth_classifier_factory(head_type="ridge", head_typo_augment=True)
    aug.add_examples(texts, labels)
    # memory identical (head-only augmentation)
    np.testing.assert_allclose(np.asarray(aug.memory.state.proto),
                               np.asarray(plain.memory.state.proto))
    assert aug.memory.texts == plain.memory.texts
    # head saw different rows
    assert not np.allclose(np.asarray(aug.head_params["out"]["w"]),
                           np.asarray(plain.head_params["out"]["w"]))
    # and still predicts correctly
    preds = aug.predict_batch(["alpha:q", "beta:q"], k=1)
    assert [p[0][0] for p in preds] == ["alpha", "beta"]


@pytest.mark.slow
def test_gaming_protocol_signature(synth_classifier_factory):
    """The reference's OWN robustness protocol (evaluate_robustness, gaming
    levels 0/1; reference strategic.py:284-358) with the cost model matched
    to strategic training: strategic training must be at least as robust as
    the regular head, and end ~fully robust (the README.md:60 signature —
    regular −20% → strategic 0%)."""
    import jax.numpy as jnp

    coeffs = [0.15] * 128
    train_texts = [f"cls{i}:{j}" for i in range(4) for j in range(10)]
    train_labels = [f"cls{i}" for i in range(4) for _ in range(10)]

    regular = synth_classifier_factory()
    regular.add_examples(train_texts, train_labels)

    strategic = synth_classifier_factory(
        enable_strategic_mode=True, cost_function_type="linear",
        cost_coefficients=coeffs, strategic_training_frequency=1)
    for s in range(0, len(train_texts), 10):
        strategic.add_examples(train_texts[s:s+10], train_labels[s:s+10])

    test_texts = [f"cls{i}:q{j}" for i in range(4) for j in range(5)]
    test_labels = [f"cls{i}" for i in range(4) for _ in range(5)]
    y = jnp.asarray([strategic.label_to_id[l] for l in test_labels])
    emb = jnp.asarray(regular._get_embeddings(test_texts))

    ev = strategic.strategic_evaluator
    reg = ev.evaluate_robustness(regular._masked_logits_fn(), emb, y,
                                 gaming_levels=[0.0, 1.0])
    st = ev.evaluate_robustness(strategic._masked_logits_fn(), emb, y,
                                gaming_levels=[0.0, 1.0])
    assert st["accuracy_gaming_0.0"] >= 0.9      # clean accuracy intact
    assert st["robustness_score"] <= reg["robustness_score"] + 1e-9
    assert st["robustness_score"] <= 0.10        # ~fully robust under gaming
