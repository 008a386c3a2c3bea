"""Training engine tests: the fused fit_head program learns, stops early,
and respects masks (reference analog: classifier.py:1428-1522 behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_classifier_tpu import training
from adaptive_classifier_tpu.models import head as head_lib

D, C_CAP = 16, 8


def separable_data(n_per=20, n_classes=3, n_cap=64, seed=0):
    r = np.random.default_rng(seed)
    centers = r.standard_normal((n_classes, D)).astype(np.float32) * 3
    xs, ys = [], []
    for c in range(n_classes):
        xs.append(centers[c] + 0.1 * r.standard_normal((n_per, D)).astype(np.float32))
        ys += [c] * n_per
    x = np.concatenate(xs)
    y = np.array(ys, np.int32)
    n = len(y)
    emb = np.zeros((n_cap, D), np.float32)
    emb[:n] = x
    labels = np.zeros((n_cap,), np.int32)
    labels[:n] = y
    valid = np.zeros((n_cap,), bool)
    valid[:n] = True
    return jnp.asarray(emb), jnp.asarray(labels), jnp.asarray(valid), x, y


def test_fit_head_learns_separable():
    emb, labels, valid, x, y = separable_data()
    params = head_lib.init_head(jax.random.PRNGKey(42), D, C_CAP, 3, hidden_dims=[D, D // 2])
    active = jnp.arange(C_CAP) < 3
    res = training.fit_head(params, emb, labels, valid, active, jax.random.PRNGKey(0),
                            max_epochs=30, patience=10, use_scheduler=False)
    logits = head_lib.head_forward(res.params, jnp.asarray(x))
    preds = np.asarray(jnp.argmax(jnp.where(active[None, :], logits, -1e9), axis=-1))
    acc = (preds == y).mean()
    assert acc > 0.95
    assert float(res.final_loss) < 0.5


def test_fit_head_default_epochs_reduce_loss():
    """Default regime (10 epochs, scheduler) makes real progress."""
    emb, labels, valid, x, y = separable_data()
    params = head_lib.init_head(jax.random.PRNGKey(42), D, C_CAP, 3, hidden_dims=[D, D // 2])
    active = jnp.arange(C_CAP) < 3
    res = training.fit_head(params, emb, labels, valid, active, jax.random.PRNGKey(0))
    assert float(res.final_loss) < 0.9  # from ~log(3)=1.1 at init


def test_epochs_bounded_and_early_stop():
    emb, labels, valid, *_ = separable_data()
    params = head_lib.init_head(jax.random.PRNGKey(42), D, C_CAP, 3)
    active = jnp.arange(C_CAP) < 3
    res = training.fit_head(params, emb, labels, valid, active,
                            jax.random.PRNGKey(0), max_epochs=10, patience=3)
    assert 1 <= int(res.epochs_run) <= 10


def test_deterministic_given_same_rng():
    emb, labels, valid, *_ = separable_data()
    params = head_lib.init_head(jax.random.PRNGKey(42), D, C_CAP, 3)
    active = jnp.arange(C_CAP) < 3
    r1 = training.fit_head(params, emb, labels, valid, active, jax.random.PRNGKey(5))
    r2 = training.fit_head(params, emb, labels, valid, active, jax.random.PRNGKey(5))
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padding_rows_do_not_train():
    """Garbage in padding rows must not affect the result."""
    emb, labels, valid, x, y = separable_data(n_cap=64)
    emb2 = np.asarray(emb).copy()
    emb2[~np.asarray(valid)] = 1e3  # poison the padding
    params = head_lib.init_head(jax.random.PRNGKey(42), D, C_CAP, 3)
    active = jnp.arange(C_CAP) < 3
    r1 = training.fit_head(params, emb, labels, valid, active, jax.random.PRNGKey(0))
    r2 = training.fit_head(params, jnp.asarray(emb2), labels, valid, active, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bce_training_learns_multilabel():
    r = np.random.default_rng(0)
    n, n_cap = 40, 64
    x = r.standard_normal((n_cap, D)).astype(np.float32)
    # label 0 active iff feature 0 > 0; label 1 iff feature 1 > 0
    multihot = np.zeros((n_cap, C_CAP), np.float32)
    multihot[:, 0] = (x[:, 0] > 0).astype(np.float32)
    multihot[:, 1] = (x[:, 1] > 0).astype(np.float32)
    valid = np.zeros((n_cap,), bool)
    valid[:n] = True
    params = head_lib.init_head(jax.random.PRNGKey(42), D, C_CAP, 2, hidden_dims=[D])
    active = jnp.arange(C_CAP) < 2
    res = training.fit_head(
        params, jnp.asarray(x), jnp.asarray(multihot), jnp.asarray(valid), active,
        jax.random.PRNGKey(0), loss_type="bce", max_epochs=100, patience=50,
        use_scheduler=False,
    )
    probs = np.asarray(jax.nn.sigmoid(head_lib.head_forward(res.params, jnp.asarray(x[:n]))))
    acc0 = ((probs[:, 0] > 0.5) == (multihot[:n, 0] > 0.5)).mean()
    assert acc0 > 0.8


def test_adamw_matches_torch_semantics():
    """Decoupled weight decay: a zero-gradient parameter still decays."""
    params = {"w": jnp.ones((4,))}
    opt = training.adamw_init(params)
    grads = {"w": jnp.zeros((4,))}
    new, _ = training.adamw_update(params, grads, opt, lr=0.1, weight_decay=0.5)
    np.testing.assert_allclose(np.asarray(new["w"]), 1.0 - 0.1 * 0.5 * 1.0, atol=1e-6)


def test_clip_global_norm():
    g = {"a": jnp.full((4,), 10.0)}
    clipped = training.clip_global_norm(g, max_norm=1.0)
    norm = float(jnp.linalg.norm(clipped["a"]))
    assert abs(norm - 1.0) < 1e-5
    g2 = {"a": jnp.full((4,), 0.01)}
    same = training.clip_global_norm(g2, max_norm=1.0)
    np.testing.assert_allclose(np.asarray(same["a"]), 0.01)
