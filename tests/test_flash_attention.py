"""Flash-attention kernel parity vs the einsum reference path (interpreter
mode — the backend-parity pattern of SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from adaptive_classifier_tpu.ops.flash_attention import (
    flash_attention, oneshot_attention,
)
from adaptive_classifier_tpu.models.encoder import (
    EncoderConfig, encoder_forward, init_params,
)


def reference_attention(q, k, v, mask):
    B, S, H, Dh = q.shape
    scale = 1.0 / np.sqrt(Dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    probs = jax.nn.softmax(logits + bias, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("S,Dh", [(128, 64), (256, 32), (131, 64)])
def test_flash_matches_reference(S, Dh):
    r = np.random.default_rng(0)
    B, H = 2, 2
    q = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.float32)
    k = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.float32)
    v = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, S // 2 :] = 0  # ragged batch
    mask = jnp.asarray(mask)
    expect = np.asarray(reference_attention(q, k, v, mask))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, mask))
    # padded-query rows are undefined in both; compare valid rows only
    m = np.asarray(mask)
    for b in range(B):
        rows = m[b] > 0
        np.testing.assert_allclose(got[b][rows], expect[b][rows], rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("S,Dh", [(64, 64), (128, 64), (512, 64), (131, 32)])
def test_oneshot_matches_reference(S, Dh):
    r = np.random.default_rng(2)
    B, H = 2, 3
    q = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.float32)
    k = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.float32)
    v = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, S // 3 :] = 0  # ragged batch
    mask = jnp.asarray(mask)
    expect = np.asarray(reference_attention(q, k, v, mask))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(oneshot_attention(q, k, v, mask))
    m = np.asarray(mask)
    for b in range(B):
        rows = m[b] > 0
        np.testing.assert_allclose(got[b][rows], expect[b][rows],
                                   rtol=2e-3, atol=2e-3)


def test_oneshot_matches_flash():
    """The two Pallas kernels agree with each other bit-for-bit-ish."""
    r = np.random.default_rng(3)
    B, S, H, Dh = 1, 256, 2, 64
    q = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.float32)
    k = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.float32)
    v = jnp.asarray(r.standard_normal((B, S, H, Dh)), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(oneshot_attention(q, k, v, mask))
        b = np.asarray(flash_attention(q, k, v, mask))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_encoder_oneshot_path_matches_einsum():
    cfg = EncoderConfig(vocab_size=256, hidden_size=64, num_layers=2,
                        num_heads=2, intermediate_size=128,
                        max_position_embeddings=128)
    params = init_params(0, cfg)
    r = np.random.default_rng(4)
    ids = jnp.asarray(r.integers(0, 250, (2, 128)), jnp.int32)
    mask = jnp.asarray(np.concatenate([np.ones((2, 77), np.int32),
                                       np.zeros((2, 51), np.int32)], axis=1))
    base = np.asarray(encoder_forward(params, ids, mask, cfg, jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        one = np.asarray(encoder_forward(params, ids, mask, cfg, jnp.float32,
                                         attn_impl="oneshot"))
    valid = np.asarray(mask)[0] > 0
    np.testing.assert_allclose(one[:, valid], base[:, valid],
                               rtol=5e-3, atol=5e-3)


def test_encoder_flash_path_matches_einsum():
    cfg = EncoderConfig(vocab_size=256, hidden_size=64, num_layers=2,
                        num_heads=2, intermediate_size=128,
                        max_position_embeddings=128)
    params = init_params(0, cfg)
    r = np.random.default_rng(1)
    ids = jnp.asarray(r.integers(0, 250, (2, 128)), jnp.int32)
    mask = jnp.asarray(np.concatenate([np.ones((2, 100), np.int32),
                                       np.zeros((2, 28), np.int32)], axis=1))
    base = np.asarray(encoder_forward(params, ids, mask, cfg, jnp.float32,
                                      use_flash=False))
    with pltpu.force_tpu_interpret_mode():
        flash = np.asarray(encoder_forward(params, ids, mask, cfg, jnp.float32,
                                           use_flash=True))
    valid = np.asarray(mask)[0] > 0
    np.testing.assert_allclose(flash[:, valid], base[:, valid], rtol=5e-3, atol=5e-3)
