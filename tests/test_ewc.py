"""EWC tests (reference analog: tests/test_ewc.py — synthetic models,
Fisher properties, penalty behavior, progressive class addition)."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_classifier_tpu import EWC, training, ewc as ewc_lib
from adaptive_classifier_tpu.models import head as head_lib

D, C_CAP = 16, 8


def make_data(n=40, n_classes=3, seed=0):
    r = np.random.default_rng(seed)
    centers = r.standard_normal((n_classes, D)).astype(np.float32) * 3
    x = np.concatenate([
        centers[c] + 0.1 * r.standard_normal((n // n_classes, D)).astype(np.float32)
        for c in range(n_classes)
    ])
    y = np.repeat(np.arange(n_classes), n // n_classes).astype(np.int32)
    return x, y


def test_fisher_nonnegative_and_shaped():
    x, _ = make_data()
    params = head_lib.init_head(jax.random.PRNGKey(0), D, C_CAP, 3)
    ewc = EWC(params, x, active=np.arange(C_CAP) < 3, ewc_lambda=10.0)
    for f, p in zip(jax.tree.leaves(ewc.fisher), jax.tree.leaves(params)):
        assert f.shape == p.shape
        assert (np.asarray(f) >= 0).all()
    assert any(np.asarray(f).sum() > 0 for f in jax.tree.leaves(ewc.fisher))


def test_loss_zero_at_old_params():
    x, _ = make_data()
    params = head_lib.init_head(jax.random.PRNGKey(0), D, C_CAP, 3)
    ewc = EWC(params, x, active=np.arange(C_CAP) < 3)
    assert float(ewc.ewc_loss(params, batch_size=32)) == 0.0


def test_loss_grows_with_distance():
    x, _ = make_data()
    params = head_lib.init_head(jax.random.PRNGKey(0), D, C_CAP, 3)
    ewc = EWC(params, x, active=np.arange(C_CAP) < 3, ewc_lambda=1.0)
    near = jax.tree.map(lambda p: p + 0.01, params)
    far = jax.tree.map(lambda p: p + 0.1, params)
    l_near = float(ewc.ewc_loss(near, batch_size=32))
    l_far = float(ewc.ewc_loss(far, batch_size=32))
    assert 0 < l_near < l_far


def test_batch_size_normalization():
    x, _ = make_data()
    params = head_lib.init_head(jax.random.PRNGKey(0), D, C_CAP, 3)
    ewc = EWC(params, x, active=np.arange(C_CAP) < 3, ewc_lambda=1.0)
    moved = jax.tree.map(lambda p: p + 0.1, params)
    l32 = float(ewc.ewc_loss(moved, batch_size=32))
    l1 = float(ewc.ewc_loss(moved, batch_size=1))
    assert abs(l1 / l32 - 32.0) < 1e-3


def test_single_sample_batch():
    """Single-example Fisher computation must not crash (reference's
    single-sample squeeze bug regression, test_ewc.py:34-85)."""
    x, _ = make_data(n=3, n_classes=3)
    params = head_lib.init_head(jax.random.PRNGKey(0), D, C_CAP, 3)
    ewc = EWC(params, x[:1], active=np.arange(C_CAP) < 3)
    assert float(ewc.ewc_loss(params, batch_size=1)) == 0.0


def test_ewc_preserves_old_task_in_training():
    """Training with the EWC penalty keeps old-class accuracy higher than
    training without it (the 20-class Banking77-like scenario in spirit,
    reference test_ewc.py:87-125)."""
    x_old, y_old = make_data(n=60, n_classes=3, seed=1)
    params = head_lib.init_head(jax.random.PRNGKey(42), D, C_CAP, 3, hidden_dims=[D])
    active3 = jnp.arange(C_CAP) < 3

    def pad(x, y, n_cap=64):
        emb = np.zeros((n_cap, D), np.float32)
        emb[: len(x)] = x
        lab = np.zeros((n_cap,), np.int32)
        lab[: len(y)] = y
        val = np.zeros((n_cap,), bool)
        val[: len(y)] = True
        return jnp.asarray(emb), jnp.asarray(lab), jnp.asarray(val)

    emb, lab, val = pad(x_old, y_old)
    trained = training.fit_head(params, emb, lab, val, active3, jax.random.PRNGKey(0)).params

    def old_acc(p):
        logits = head_lib.head_forward(p, jnp.asarray(x_old))
        preds = np.asarray(jnp.argmax(jnp.where(active3[None, :], logits, -1e9), -1))
        return (preds == y_old).mean()

    assert old_acc(trained) > 0.9

    # new task: classes 3-4 only
    r = np.random.default_rng(9)
    centers = r.standard_normal((2, D)).astype(np.float32) * 3
    x_new = np.concatenate([centers[c] + 0.1 * r.standard_normal((30, D)).astype(np.float32) for c in range(2)])
    y_new = np.repeat(np.arange(3, 5), 30).astype(np.int32)
    emb_n, lab_n, val_n = pad(x_new, y_new)
    active5 = jnp.arange(C_CAP) < 5

    bundle = ewc_lib.make_ewc_bundle(
        trained, emb, val, active3, jax.random.PRNGKey(1), ewc_lambda=50.0
    )
    with_ewc = training.fit_head(
        trained, emb_n, lab_n, val_n, active5, jax.random.PRNGKey(2),
        max_epochs=15, use_scheduler=False,
        has_ewc=True, ewc_old=bundle.old_params, ewc_fisher=bundle.fisher,
        ewc_lambda=bundle.ewc_lambda,
    ).params
    without_ewc = training.fit_head(
        trained, emb_n, lab_n, val_n, active5, jax.random.PRNGKey(2),
        max_epochs=15, use_scheduler=False,
    ).params

    def old_acc5(p):
        logits = head_lib.head_forward(p, jnp.asarray(x_old))
        preds = np.asarray(jnp.argmax(jnp.where(active5[None, :], logits, -1e9), -1))
        return (preds == y_old).mean()

    assert old_acc5(with_ewc) >= old_acc5(without_ewc)
