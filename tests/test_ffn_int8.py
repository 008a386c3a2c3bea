"""Fused int8 FFN kernel tests — kernel-vs-float-oracle parity (the
backend-parity pattern of SURVEY.md §4, analog of the reference's
ONNX-vs-PyTorch cosine tests, tests/test_onnx_phase1.py:68-96)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptive_classifier_tpu.ops.ffn_int8 import (
    _gelu_tanh, ffn_block_int8, ffn_block_ref,
)
from adaptive_classifier_tpu.models.encoder_int8 import quantize_weight


def test_gelu_tanh_close_to_exact():
    """Tanh-approximation gelu stays within 1e-2 of exact gelu everywhere
    (the deviation is far inside the int8 noise floor)."""
    x = jnp.linspace(-6.0, 6.0, 4001)
    approx = _gelu_tanh(x)
    exact = jax.nn.gelu(x, approximate=False)
    assert float(jnp.max(jnp.abs(approx - exact))) < 1e-2


def _inputs(M=512, D=128, H=512, seed=0):
    r = np.random.default_rng(seed)
    h = jnp.asarray(r.standard_normal((M, D)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(r.standard_normal((D, H)) * 0.05, jnp.float32)
    b1 = jnp.asarray(r.standard_normal((H,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(r.standard_normal((H, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(r.standard_normal((D,)) * 0.01, jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * r.standard_normal((D,)), jnp.float32)
    beta = jnp.asarray(0.1 * r.standard_normal((D,)), jnp.float32)
    return h, w1, b1, w2, b2, g, beta


def _check_parity(tile_m=256, M=512):
    h, w1, b1, w2, b2, g, beta = _inputs(M=M)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    out_k = np.asarray(
        ffn_block_int8(h, w1q, s1, b1, w2q, s2, b2, g, beta, 1e-12,
                       tile_m=tile_m), np.float32)
    out_r = np.asarray(ffn_block_ref(h, w1, b1, w2, b2, g, beta, 1e-12))
    cos = (out_k * out_r).sum(1) / (
        np.linalg.norm(out_k, axis=1) * np.linalg.norm(out_r, axis=1))
    assert cos.min() > 0.995, cos.min()


def test_kernel_matches_oracle_interpret():
    """Kernel parity via the Pallas interpreter (no TPU needed in CI)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        _check_parity(tile_m=256, M=512)


def test_kernel_pads_ragged_rows_interpret():
    """M not divisible by tile_m takes the padded path; padded rows are
    sliced off and real rows still match the oracle."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        _check_parity(tile_m=256, M=320)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_kernel_matches_oracle_tpu():
    """Compiled-kernel parity on real hardware (bert-base dims)."""
    h, w1, b1, w2, b2, g, beta = _inputs(M=1024, D=768, H=3072)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    out_k = np.asarray(
        ffn_block_int8(h, w1q, s1, b1, w2q, s2, b2, g, beta, 1e-12), np.float32)
    out_r = np.asarray(ffn_block_ref(h, w1, b1, w2, b2, g, beta, 1e-12))
    cos = (out_k * out_r).sum(1) / (
        np.linalg.norm(out_k, axis=1) * np.linalg.norm(out_r, axis=1))
    assert cos.min() > 0.995, cos.min()


def test_int8_encoder_uses_fused_ffn_and_matches_unfused():
    """encoder_forward_int8(use_fused_ffn=True) ≈ the unfused int8 path
    (gelu form differs: tanh vs exact — bounded by the int8 envelope)."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_classifier_tpu.models.encoder import EncoderConfig, init_params
    from adaptive_classifier_tpu.models.encoder_int8 import (
        embed_texts_device_int8, quantize_encoder_for_inference,
    )

    cfg = EncoderConfig(vocab_size=512, hidden_size=128, num_layers=2,
                        num_heads=2, intermediate_size=512,
                        max_position_embeddings=64)
    params = init_params(0, cfg)
    qparams = quantize_encoder_for_inference(params)
    r = np.random.default_rng(1)
    ids = jnp.asarray(r.integers(0, 500, (8, 32)), jnp.int32)
    mask = jnp.ones((8, 32), jnp.int32)

    plain = np.asarray(embed_texts_device_int8(
        qparams, ids, mask, cfg, jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        from adaptive_classifier_tpu.models.encoder_int8 import encoder_forward_int8

        hidden = encoder_forward_int8(qparams, ids, mask, cfg, jnp.float32,
                                      use_fused_ffn=True)
        cls = hidden[:, 0, :]
        fused = np.asarray(cls / jnp.linalg.norm(cls, axis=-1, keepdims=True))
    cos = (plain * fused).sum(1)
    assert (cos > 0.99).all(), cos


# ---------------------------------------------------------------------------
# attn_ffn_block_int8 — O-projection + both LNs folded into the FFN program
# ---------------------------------------------------------------------------

def _attn_inputs(M=512, D=128, H=512, seed=3):
    r = np.random.default_rng(seed)
    ctx = jnp.asarray(r.standard_normal((M, D)) * 0.5, jnp.bfloat16)
    x = jnp.asarray(r.standard_normal((M, D)) * 0.5, jnp.bfloat16)
    ow = jnp.asarray(r.standard_normal((D, D)) * 0.05, jnp.float32)
    ob = jnp.asarray(r.standard_normal((D,)) * 0.01, jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * r.standard_normal((D,)), jnp.float32)
    be1 = jnp.asarray(0.1 * r.standard_normal((D,)), jnp.float32)
    h_, w1, b1, w2, b2, g2, be2 = _inputs(M=M, D=D, H=H, seed=seed + 1)
    return ctx, x, ow, ob, g1, be1, w1, b1, w2, b2, g2, be2


def _check_attn_ffn_parity(tile_m=256, M=512):
    from adaptive_classifier_tpu.ops.ffn_int8 import (
        attn_ffn_block_int8, attn_ffn_block_ref,
    )

    ctx, x, ow, ob, g1, be1, w1, b1, w2, b2, g2, be2 = _attn_inputs(M=M)
    owq, os_ = quantize_weight(ow)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    out_k = np.asarray(attn_ffn_block_int8(
        ctx, x, owq, os_, ob, g1, be1, w1q, s1, b1, w2q, s2, b2,
        g2, be2, 1e-12, tile_m=tile_m), np.float32)
    out_r = np.asarray(attn_ffn_block_ref(
        ctx, x, ow, ob, g1, be1, w1, b1, w2, b2, g2, be2, 1e-12))
    cos = (out_k * out_r).sum(1) / (
        np.linalg.norm(out_k, axis=1) * np.linalg.norm(out_r, axis=1))
    assert cos.min() > 0.995, cos.min()


def test_attn_ffn_kernel_matches_oracle_interpret():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        _check_attn_ffn_parity(tile_m=256, M=512)


def test_attn_ffn_kernel_pads_ragged_rows_interpret():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        _check_attn_ffn_parity(tile_m=256, M=320)


def test_int8_forward_fuse_o_proj_matches_unfused():
    """encoder_forward_int8(fuse_o_proj=True) == the unfused int8 path
    within the int8 noise floor (same math, different fusion)."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_classifier_tpu.models.encoder import EncoderConfig, init_params
    from adaptive_classifier_tpu.models.encoder_int8 import (
        encoder_forward_int8, quantize_encoder_for_inference,
    )

    cfg = EncoderConfig(vocab_size=512, hidden_size=128, num_layers=2,
                        num_heads=2, intermediate_size=256,
                        max_position_embeddings=64)
    qp = quantize_encoder_for_inference(init_params(0, cfg))
    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(0, 500, (2, 64)), jnp.int32)
    mask = jnp.ones((2, 64), jnp.int32)
    base = np.asarray(encoder_forward_int8(
        qp, ids, mask, cfg, jnp.float32, use_fused_ffn=False,
        fuse_o_proj=False))
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(encoder_forward_int8(
            qp, ids, mask, cfg, jnp.float32, use_fused_ffn=True,
            fuse_o_proj=True))
    flat_b = base.reshape(-1, base.shape[-1])
    flat_f = fused.reshape(-1, fused.shape[-1])
    cos = (flat_b * flat_f).sum(1) / (
        np.linalg.norm(flat_b, axis=1) * np.linalg.norm(flat_f, axis=1))
    assert cos.min() > 0.99, cos.min()
