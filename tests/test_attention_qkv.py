"""Packed-QKV fused attention kernel parity vs the einsum reference path
(interpreter mode — the backend-parity pattern of SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from adaptive_classifier_tpu.ops.attention_qkv import attention_from_qkv


def reference_from_qkv(qkv, mask, H, Dh):
    B, S, threeD = qkv.shape
    D = H * Dh
    q = qkv[..., :D].reshape(B, S, H, Dh)
    k = qkv[..., D:2 * D].reshape(B, S, H, Dh)
    v = qkv[..., 2 * D:].reshape(B, S, H, Dh)
    scale = 1.0 / np.sqrt(Dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    probs = jax.nn.softmax(logits + bias, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return ctx.reshape(B, S, D).astype(qkv.dtype)


@pytest.mark.parametrize("variant,B,S,H,Dh", [
    ("pair", 2, 64, 12, 64),      # bert-base shape, even heads
    ("pair", 4, 64, 8, 64),       # ac-base shape, NB packing kicks in
    ("pair", 2, 128, 12, 64),
    ("pair", 1, 64, 3, 64),       # odd head count → solo tail head
    ("perhead", 2, 64, 12, 64),
    ("perhead", 2, 64, 4, 32),    # non-64 head_dim falls to perhead
    ("phased", 2, 64, 12, 64),    # rejected scheduling variant (r5 A/B),
    ("phased", 1, 64, 3, 64),     # kept as a tested building block
])
def test_matches_reference(variant, B, S, H, Dh):
    r = np.random.default_rng(0)
    qkv = jnp.asarray(r.standard_normal((B, S, 3 * H * Dh)), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, S // 2:] = 0          # ragged batch
    mask = jnp.asarray(mask)
    expect = np.asarray(reference_from_qkv(qkv, mask, H, Dh))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(attention_from_qkv(qkv, mask, H, Dh,
                                            variant=variant))
    np.testing.assert_allclose(got, expect, atol=2e-5, rtol=2e-5)


def test_bf16_auto_variant():
    r = np.random.default_rng(1)
    B, S, H, Dh = 2, 64, 12, 64
    qkv = jnp.asarray(r.standard_normal((B, S, 3 * H * Dh)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    expect = np.asarray(
        reference_from_qkv(qkv, mask, H, Dh).astype(jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            attention_from_qkv(qkv, mask, H, Dh).astype(jnp.float32))
    # bf16 inputs, f32 scores: kernel and reference round differently
    cos = (got * expect).sum() / (
        np.linalg.norm(got) * np.linalg.norm(expect))
    assert cos > 0.999
    np.testing.assert_allclose(got, expect, atol=0.05)


def test_fully_masked_query_rows_are_finite():
    B, S, H, Dh = 1, 64, 2, 64
    qkv = jnp.ones((B, S, 3 * H * Dh), jnp.float32)
    mask = jnp.zeros((B, S), jnp.int32)   # everything masked
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(attention_from_qkv(qkv, mask, H, Dh))
    assert np.isfinite(got).all()
