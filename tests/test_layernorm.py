"""Fused add+LayerNorm kernel parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from adaptive_classifier_tpu.ops.layernorm import add_layer_norm, add_layer_norm_pallas


def reference(x, r, scale, bias, eps):
    s = x.astype(jnp.float32) + r.astype(jnp.float32)
    mean = jnp.mean(s, -1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), -1, keepdims=True)
    return ((s - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 128, 64), (1, 8, 128)])
def test_kernel_matches_reference(dtype, shape):
    r = np.random.default_rng(0)
    B, S, D = shape
    x = jnp.asarray(r.standard_normal((B, S, D)), dtype)
    res = jnp.asarray(r.standard_normal((B, S, D)), dtype)
    scale = jnp.asarray(r.standard_normal(D), jnp.float32)
    bias = jnp.asarray(r.standard_normal(D), jnp.float32)
    expect = np.asarray(reference(x, res, scale, bias, 1e-12), np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            add_layer_norm(x, res, scale, bias, 1e-12, use_pallas=True),
            np.float32,
        )
    atol = 5e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(got, expect, atol=atol)


def test_jnp_fallback_matches_reference():
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((2, 16, 32)), jnp.float32)
    res = jnp.asarray(r.standard_normal((2, 16, 32)), jnp.float32)
    scale = jnp.ones(32)
    bias = jnp.zeros(32)
    got = np.asarray(add_layer_norm(x, res, scale, bias, 1e-12, use_pallas=False))
    expect = np.asarray(reference(x, res, scale, bias, 1e-12))
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_encoder_unaffected_on_cpu():
    """CPU encoder path (use_pallas off) still matches torch parity — covered
    by test_hf_parity; here just a smoke that the forward runs."""
    from adaptive_classifier_tpu.models.encoder import (
        EncoderConfig, embed_texts_device, init_params,
    )

    cfg = EncoderConfig(vocab_size=128, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=32)
    params = init_params(0, cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    e = np.asarray(embed_texts_device(params, ids, mask, cfg, jnp.float32))
    assert np.isfinite(e).all()
