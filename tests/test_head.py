"""Adaptive head tests (reference analog: models.py:30-98 behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_classifier_tpu.models import head as head_lib
from adaptive_classifier_tpu.models.head import AdaptiveHead, MultiLabelAdaptiveHead


def test_forward_shapes():
    params = head_lib.init_head(jax.random.PRNGKey(42), 16, 8, 3, hidden_dims=[16, 8])
    x = jnp.ones((4, 16))
    logits = head_lib.head_forward(params, x)
    assert logits.shape == (4, 8)


def test_masked_probs_zero_on_inactive():
    params = head_lib.init_head(jax.random.PRNGKey(42), 16, 8, 3)
    x = jnp.ones((2, 16))
    logits = head_lib.head_forward(params, x)
    active = jnp.arange(8) < 3
    probs = np.asarray(head_lib.masked_probs(logits, active))
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-6)
    assert (probs[:, 3:] == 0).all()


def test_deterministic_init():
    p1 = head_lib.init_head(jax.random.PRNGKey(42), 16, 8, 3)
    p2 = head_lib.init_head(jax.random.PRNGKey(42), 16, 8, 3)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_grow_capacity_preserves_logits():
    params = head_lib.init_head(jax.random.PRNGKey(0), 16, 8, 3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)), jnp.float32)
    before = head_lib.head_forward(params, x)[:, :8]
    grown = head_lib.grow_capacity(params, 16, jax.random.PRNGKey(1), 10)
    after = head_lib.head_forward(grown, x)
    np.testing.assert_allclose(np.asarray(after[:, :8]), np.asarray(before), atol=1e-6)
    assert after.shape == (4, 16)


def test_dropout_only_in_train_mode():
    params = head_lib.init_head(jax.random.PRNGKey(0), 16, 8, 3)
    x = jnp.ones((8, 16))
    a = head_lib.head_forward(params, x, train=False)
    b = head_lib.head_forward(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = head_lib.head_forward(params, x, dropout_rng=jax.random.PRNGKey(1), train=True)
    d = head_lib.head_forward(params, x, dropout_rng=jax.random.PRNGKey(2), train=True)
    assert not np.allclose(np.asarray(c), np.asarray(d))


def test_torch_state_dict_roundtrip():
    params = head_lib.init_head(jax.random.PRNGKey(0), 16, 8, 5, hidden_dims=[16, 8])
    sd = head_lib.to_torch_state_dict(params, 5)
    # reference naming: Sequential indices 0, 3, 6
    assert set(sd) == {"model.0.weight", "model.0.bias", "model.3.weight",
                       "model.3.bias", "model.6.weight", "model.6.bias"}
    assert sd["model.6.weight"].shape == (5, 8)  # torch [out, in], trimmed
    restored, hidden_dims = head_lib.from_torch_state_dict(sd, 8)
    assert hidden_dims == [16, 8]
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 16)), jnp.float32)
    a = head_lib.head_forward(params, x)[:, :5]
    b = head_lib.head_forward(restored, x)[:, :5]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestAdaptiveHeadFacade:
    def test_forward_and_grow(self):
        head = AdaptiveHead(16, 3)
        x = np.random.default_rng(0).standard_normal((4, 16)).astype(np.float32)
        out = np.asarray(head(x))
        assert out.shape == (4, 3)
        head.update_num_classes(5)
        out2 = np.asarray(head(x))
        assert out2.shape == (4, 5)
        np.testing.assert_allclose(out2[:, :3], out, atol=1e-6)

    def test_1d_input_gets_batch_dim(self):
        head = AdaptiveHead(16, 3)
        out = np.asarray(head(np.ones(16, np.float32)))
        assert out.shape == (1, 3)


class TestMultiLabelHead:
    def test_sigmoid_range(self):
        head = MultiLabelAdaptiveHead(16, 4)
        x = np.random.default_rng(0).standard_normal((5, 16)).astype(np.float32)
        out = np.asarray(head(x))
        assert out.shape == (5, 4)
        assert (out >= 0).all() and (out <= 1).all()

    def test_growth_preserves_weights(self):
        head = MultiLabelAdaptiveHead(16, 3)
        x = np.random.default_rng(1).standard_normal((2, 16)).astype(np.float32)
        before = np.asarray(head(x))
        head.update_num_classes(6)
        after = np.asarray(head(x))
        np.testing.assert_allclose(after[:, :3], before, atol=1e-6)
