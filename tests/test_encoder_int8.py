"""Int8 encoder forward tests — accuracy envelope vs the float forward
(the reference's quantized-ONNX acceptance pattern: top-1 parity and
bounded score drift, test_onnx_phase2.py:114-158)."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_classifier_tpu.models.encoder import (
    EncoderConfig, embed_texts_device, init_params,
)
from adaptive_classifier_tpu.models.encoder_int8 import (
    embed_texts_device_int8, quantize_encoder_for_inference, quantize_weight,
)


def test_weight_quantization_error_bounded():
    r = np.random.default_rng(0)
    w = jnp.asarray(r.standard_normal((64, 32)), jnp.float32)
    q, s = quantize_weight(w)
    back = q.astype(jnp.float32) * s[None, :]
    rel = float(jnp.max(jnp.abs(back - w)) / jnp.max(jnp.abs(w)))
    assert rel < 0.01


def test_int8_embedding_cosine_parity():
    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=3,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=64)
    params = init_params(0, cfg)
    qparams = quantize_encoder_for_inference(params)

    r = np.random.default_rng(1)
    B, S = 4, 24
    ids = jnp.asarray(r.integers(0, 500, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)

    full = np.asarray(embed_texts_device(params, ids, mask, cfg, jnp.float32))
    quant = np.asarray(embed_texts_device_int8(qparams, ids, mask, cfg, jnp.float32))
    cos = (full * quant).sum(axis=1)
    assert (cos > 0.99).all(), cos


def test_int8_oneshot_attention_parity():
    """int8 + Pallas one-shot attention == int8 + einsum attention."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=2,
                        num_heads=2, intermediate_size=128,
                        max_position_embeddings=64)
    qparams = quantize_encoder_for_inference(init_params(0, cfg))
    r = np.random.default_rng(5)
    B, S = 3, 40
    ids = jnp.asarray(r.integers(0, 500, (B, S)), jnp.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 25:] = 0
    mask = jnp.asarray(mask)
    base = np.asarray(embed_texts_device_int8(qparams, ids, mask, cfg,
                                              jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        one = np.asarray(embed_texts_device_int8(qparams, ids, mask, cfg,
                                                 jnp.float32,
                                                 attn_impl="oneshot"))
    np.testing.assert_allclose(one, base, rtol=5e-3, atol=5e-3)


def test_int8_fusedqkv_attention_parity():
    """int8 + packed-QKV Pallas attention == int8 + einsum attention."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = EncoderConfig(vocab_size=512, hidden_size=128, num_layers=2,
                        num_heads=2, intermediate_size=256,
                        max_position_embeddings=64)
    qparams = quantize_encoder_for_inference(init_params(0, cfg))
    r = np.random.default_rng(6)
    B, S = 3, 40
    ids = jnp.asarray(r.integers(0, 500, (B, S)), jnp.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 25:] = 0
    mask = jnp.asarray(mask)
    base = np.asarray(embed_texts_device_int8(qparams, ids, mask, cfg,
                                              jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        fq = np.asarray(embed_texts_device_int8(qparams, ids, mask, cfg,
                                                jnp.float32,
                                                attn_impl="fusedqkv"))
    np.testing.assert_allclose(fq, base, rtol=5e-3, atol=5e-3)


def test_int8_roberta_position_ids_match_float_path():
    """RoBERTa + int8 uses cumsum(mask)+pad position ids like the float
    path (encoder.py:210-216) — pad rows must not read position rows 0/1."""
    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=80, arch="roberta",
                        pad_token_id=1)
    params = init_params(0, cfg)
    qparams = quantize_encoder_for_inference(params)
    r = np.random.default_rng(3)
    B, S = 4, 24
    ids = np.asarray(r.integers(2, 500, (B, S)), np.int32)
    lens = [24, 16, 9, 20]
    mask = np.zeros((B, S), np.int32)
    for i, n in enumerate(lens):
        ids[i, n:] = 1  # pad_token_id
        mask[i, :n] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    full = np.asarray(embed_texts_device(params, ids, mask, cfg, jnp.float32))
    quant = np.asarray(embed_texts_device_int8(qparams, ids, mask, cfg, jnp.float32))
    cos = (full * quant).sum(axis=1)
    assert (cos > 0.99).all(), cos


def test_int8_classification_top1_parity():
    """Top-1 class agreement through the kNN path (the reference accepts
    quantized backends when top-1 matches and scores drift < 0.05)."""
    from adaptive_classifier_tpu.ops import knn

    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=3,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=64)
    params = init_params(0, cfg)
    qparams = quantize_encoder_for_inference(params)
    r = np.random.default_rng(2)
    ids = jnp.asarray(r.integers(0, 500, (6, 16)), jnp.int32)
    mask = jnp.ones((6, 16), jnp.int32)
    protos = jnp.asarray(r.standard_normal((8, 64)), jnp.float32)
    protos = protos / jnp.linalg.norm(protos, axis=1, keepdims=True)
    valid = jnp.ones(8, bool)

    e_full = embed_texts_device(params, ids, mask, cfg, jnp.float32)
    e_q = embed_texts_device_int8(qparams, ids, mask, cfg, jnp.float32)
    s_full, i_full = knn.topk_scores(knn.masked_sims_ref(e_full, protos, valid), valid, 3)
    s_q, i_q = knn.topk_scores(knn.masked_sims_ref(e_q, protos, valid), valid, 3)
    np.testing.assert_array_equal(np.asarray(i_full)[:, 0], np.asarray(i_q)[:, 0])
    assert np.abs(np.asarray(s_full) - np.asarray(s_q)).max() < 0.05


def test_classifier_with_int8_quantization(synth_classifier_factory):
    """ModelConfig.quantization='int8' routes the encoder through the int8
    path end-to-end (reference config key, models.py:138)."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config={
        "quantization": "int8",
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32], "embedding_cache_size": 0,
    })
    emb = clf._get_embeddings(["hello world", "other text"])
    assert np.isfinite(emb).all()
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    # int8 weights actually present (QKV fused at quantization time)
    assert "qkv_w.int8" in clf.encoder.params["layers"]
