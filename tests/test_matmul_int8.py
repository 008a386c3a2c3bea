"""Weight-stationary int8 projection kernels (ops/matmul_int8.py) —
interpreter parity vs float oracles, int8-noise envelope, ragged rows.
The analog of the reference's ONNX-vs-PyTorch quantization tests
(reference tests/test_onnx_phase2.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptive_classifier_tpu.models.encoder_int8 import quantize_weight
from adaptive_classifier_tpu.ops import matmul_int8 as m8


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    M, D, N = 256, 128, 384
    x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(D, N)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(N,)).astype(np.float32) * 0.1)
    w_q, s = quantize_weight(w)
    return x, w, b, w_q, s


def test_quant_matmul_matches_oracle_interpret(problem):
    from jax.experimental.pallas import tpu as pltpu

    x, w, b, w_q, s = problem
    ref = m8.quant_matmul_ref(x, w, b)
    with pltpu.force_tpu_interpret_mode():
        got = m8.quant_matmul_int8(x, w_q, s, b, tile_m=128)
    assert _cos(got, ref) > 0.999


def test_quant_matmul_ragged_rows_interpret(problem):
    from jax.experimental.pallas import tpu as pltpu

    x, w, b, w_q, s = problem
    xr = x[:200]  # not a tile multiple
    ref = m8.quant_matmul_ref(xr, w, b)
    with pltpu.force_tpu_interpret_mode():
        got = m8.quant_matmul_int8(xr, w_q, s, b, tile_m=128)
    assert got.shape == (200, w.shape[1])
    assert _cos(got, ref) > 0.999


def test_proj_residual_ln_matches_oracle_interpret():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    M, D = 256, 128
    x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.2 + 1.0)
    beta = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    w_q, s = quantize_weight(w)
    ref = m8.proj_residual_ln_ref(x, w, b, res, g, beta, 1e-12)
    with pltpu.force_tpu_interpret_mode():
        got = m8.proj_residual_ln_int8(x, w_q, s, b, res, g, beta, 1e-12,
                                       tile_m=128)
    assert _cos(got, ref) > 0.999
    # LN semantics survive quantization: unit-variance rows (pre-affine
    # check via inverting the affine)
    inv = (np.asarray(got) - np.asarray(beta)) / np.asarray(g)
    assert abs(float(inv.std(axis=1).mean()) - 1.0) < 0.02


def test_int8_encoder_end_to_end_uses_kernels_interpret():
    """Full int8 encoder forward with the fused path forced on — cosine vs
    the bf16 float forward stays in the accepted int8 envelope."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_classifier_tpu.models.encoder import EncoderConfig
    from adaptive_classifier_tpu.models import encoder_int8 as e8
    from adaptive_classifier_tpu import pretrain

    cfg = EncoderConfig(vocab_size=512, hidden_size=128, num_layers=2,
                        num_heads=2, intermediate_size=256,
                        max_position_embeddings=64)
    params = pretrain.init_params(0, cfg)
    qparams = e8.quantize_encoder_for_inference(params)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(1, 512, size=(8, 32)).astype(np.int32))
    mask = jnp.ones((8, 32), jnp.int32)

    from adaptive_classifier_tpu.models.encoder import encoder_forward
    ref = encoder_forward(params, ids, mask, cfg, compute_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = e8.encoder_forward_int8(qparams, ids, mask, cfg,
                                      compute_dtype=jnp.float32,
                                      use_fused_ffn=True)
    assert _cos(got, ref) > 0.99
