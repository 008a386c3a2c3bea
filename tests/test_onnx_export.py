"""ONNX export artifact tests — offline.

The reference's export (classifier.py:1031-1107) produces model.onnx /
model_quantized.onnx loadable by any ORT consumer.  No onnx/onnxruntime
exists in this environment, so verification is first-party end to end:
serialize with the protobuf writer, re-parse with the independent reader,
execute with the numpy interpreter, and compare against the JAX forward —
proving the artifact encodes the same function the TPU path computes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adaptive_classifier_tpu.models.encoder import (
    Encoder, EncoderConfig, encoder_forward, init_params,
)
from adaptive_classifier_tpu.onnx_export import (
    OnnxLiteModel, build_encoder_graph, export_encoder_onnx,
)


def _random_inputs(B=2, S=12, V=500, pad_tail=True, seed=0):
    r = np.random.default_rng(seed)
    ids = r.integers(5, V, (B, S)).astype(np.int64)
    mask = np.ones((B, S), np.int64)
    if pad_tail:
        mask[-1, S - 4:] = 0
    return ids, mask


def _jax_reference(params, cfg, ids, mask):
    hidden = np.asarray(encoder_forward(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        cfg, compute_dtype=jnp.float32, attn_impl="einsum"))
    if cfg.pooling == "mean":
        m = mask[:, :, None].astype(np.float32)
        pooled = (hidden * m).sum(1) / np.maximum(m.sum(1), 1.0)
    else:
        pooled = hidden[:, 0, :]
    sent = pooled / np.maximum(np.linalg.norm(pooled, axis=-1, keepdims=True),
                               1e-12)
    return hidden, sent


def _roundtrip(cfg, tmp_path, quantize=False, seed=0):
    params = init_params(seed, cfg)
    path = tmp_path / ("model_quantized.onnx" if quantize else "model.onnx")
    path.write_bytes(build_encoder_graph(params, cfg, quantize=quantize))
    ids, mask = _random_inputs(V=min(cfg.vocab_size, 500))
    model = OnnxLiteModel(path)
    assert model.input_names == ["input_ids", "attention_mask"]
    assert model.output_names == ["last_hidden_state", "sentence_embedding"]
    out = model.run({"input_ids": ids, "attention_mask": mask})
    hidden, sent = _jax_reference(params, cfg, ids, mask)
    return out, hidden, sent


def test_bert_onnx_matches_jax_forward(tmp_path):
    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=3,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=64)
    out, hidden, sent = _roundtrip(cfg, tmp_path)
    np.testing.assert_allclose(out["last_hidden_state"], hidden, atol=1e-4)
    np.testing.assert_allclose(out["sentence_embedding"], sent, atol=1e-5)


def test_roberta_position_ids_path(tmp_path):
    """RoBERTa's cumsum-offset position ids are emitted as CumSum/Mul/Add
    graph ops, not baked for a fixed S."""
    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=66, type_vocab_size=1,
                        pad_token_id=1, arch="roberta")
    params = init_params(0, cfg)
    path = tmp_path / "model.onnx"
    path.write_bytes(build_encoder_graph(params, cfg))
    ids, mask = _random_inputs()
    ids[mask == 0] = 1                        # pad token at pad positions
    out = OnnxLiteModel(path).run({"input_ids": ids, "attention_mask": mask})
    hidden, sent = _jax_reference(params, cfg, ids, mask)
    np.testing.assert_allclose(out["last_hidden_state"], hidden, atol=1e-4)
    np.testing.assert_allclose(out["sentence_embedding"], sent, atol=1e-5)


def test_electra_projection_and_mean_pooling(tmp_path):
    """Narrow embedding table + embeddings_project, masked mean pooling."""
    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=64, embedding_size=32,
                        arch="electra", pooling="mean")
    out, hidden, sent = _roundtrip(cfg, tmp_path)
    np.testing.assert_allclose(out["last_hidden_state"], hidden, atol=1e-4)
    np.testing.assert_allclose(out["sentence_embedding"], sent, atol=1e-5)


def test_quantized_artifact_smaller_and_close(tmp_path):
    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=3,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=64)
    params = init_params(0, cfg)
    fp = tmp_path / "model.onnx"
    qp = tmp_path / "model_quantized.onnx"
    fp.write_bytes(build_encoder_graph(params, cfg, quantize=False))
    qp.write_bytes(build_encoder_graph(params, cfg, quantize=True))
    # MatMul weights dominate; int8 storage should shrink the file toward
    # the reference's "4× smaller" headline (embeddings stay fp32 here,
    # mirroring ORT dynamic quantization)
    assert qp.stat().st_size < 0.55 * fp.stat().st_size
    ids, mask = _random_inputs(V=500)
    feeds = {"input_ids": ids, "attention_mask": mask}
    sf = OnnxLiteModel(fp).run(feeds)["sentence_embedding"]
    sq = OnnxLiteModel(qp).run(feeds)["sentence_embedding"]
    cos = (sf * sq).sum(-1)
    assert (cos > 0.99).all(), cos


def test_encoder_facade_export(tmp_path):
    enc = Encoder("prajjwal1/bert-tiny", compute_dtype="float32")
    out_dir = export_encoder_onnx(enc, tmp_path, quantize=True)
    assert (out_dir / "model.onnx").exists()
    assert (out_dir / "model_quantized.onnx").exists()
    ids, mask = _random_inputs(V=min(enc.config.vocab_size, 500))
    out = OnnxLiteModel(out_dir / "model.onnx").run(
        {"input_ids": ids, "attention_mask": mask})
    ours = np.asarray(enc._embed_jit(
        enc.params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    cos = (out["sentence_embedding"] * ours).sum(-1)
    assert (cos > 0.9999).all(), cos


def test_classifier_export_onnx_surface(tmp_path):
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config={
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32]})
    out = clf.export_onnx(tmp_path / "onnx")
    assert (out / "model.onnx").exists()
    assert (out / "model_quantized.onnx").exists()
    assert (out / "quantized" / "model_int8.safetensors").exists()


def test_unsupported_arch_fails_loudly(tmp_path):
    cfg = EncoderConfig(arch="mpnet", relative_attn_buckets=32,
                        vocab_size=512, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128)
    params = init_params(0, cfg)
    with pytest.raises(ValueError, match="ONNX export supports"):
        build_encoder_graph(params, cfg)
