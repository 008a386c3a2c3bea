"""Int8 quantization tests — the analog of the reference's ONNX phase tests
(size claims + embedding cosine parity, test_onnx_phase1/2)."""

import json

import numpy as np
import pytest

from adaptive_classifier_tpu.models.encoder import Encoder, EncoderConfig
from adaptive_classifier_tpu.quantization import (
    dequantize_tree, load_quantized_encoder_params, quantize_tree,
    save_quantized_encoder,
)


def test_quantize_dequantize_roundtrip_error_bounded():
    r = np.random.default_rng(0)
    tree = {"w": r.standard_normal((64, 32)).astype(np.float32),
            "b": r.standard_normal((32,)).astype(np.float32)}
    tensors, manifest = quantize_tree(tree)
    assert "w.int8" in tensors and tensors["w.int8"].dtype == np.int8
    assert "b" in tensors  # small vectors pass through
    back = dequantize_tree(tensors)
    w, bw = np.asarray(back["w"]), tree["w"]
    rel = np.abs(w - bw).max() / np.abs(bw).max()
    assert rel < 0.01  # 127-level symmetric per-channel
    np.testing.assert_array_equal(np.asarray(back["b"]), tree["b"])


def test_quantized_size_reduction(tmp_path):
    enc = Encoder("prajjwal1/bert-tiny")
    qdir = save_quantized_encoder(enc, tmp_path / "q")
    size_q = (qdir / "model_int8.safetensors").stat().st_size
    import jax

    size_full = sum(np.asarray(l).nbytes for l in jax.tree.leaves(enc.params))
    assert size_q < size_full / 3  # ~4x smaller (README.md:244 claim)


def test_quantized_embedding_cosine_parity(tmp_path):
    """Quantized encoder embeddings stay cosine > 0.99 vs full precision —
    the reference's ONNX-parity threshold (test_onnx_phase1.py:68-96)."""
    enc = Encoder("prajjwal1/bert-tiny", compute_dtype="float32")
    qdir = save_quantized_encoder(enc, tmp_path / "q")
    params, enc_cfg, qcfg = load_quantized_encoder_params(qdir)

    texts = ["the quick brown fox", "refund my payment please", "great product"]
    full = np.asarray(enc.embed(texts))
    enc.params = params
    quant = np.asarray(enc.embed(texts))
    cos = (full * quant).sum(axis=1)
    assert (cos > 0.99).all(), cos


def test_classifier_save_includes_quantized(tmp_path, synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples(["a:1", "b:1"], ["a", "b"])
    saved = clf.save(str(tmp_path / "m"))
    assert (tmp_path / "m" / "quantized" / "model_int8.safetensors").exists()
    cfg = json.loads((tmp_path / "m" / "quantized" / "quantize_config.json").read_text())
    assert cfg["scheme"] == "int8_symmetric_per_channel"
    assert cfg["encoder_pretrained"] is False  # offline fallback weights


def test_offline_load_does_not_use_unpretrained_quantized(tmp_path, synth_classifier_factory):
    """Offline-derived weights are exact on reload; the int8 export (lossy)
    must not replace them when it captured non-pretrained weights."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = synth_classifier_factory()
    clf.add_examples(["a:1", "b:1"], ["a", "b"])
    p = tmp_path / "m"
    clf.save(str(p))
    clf2 = AdaptiveClassifier.load(str(p))
    import jax

    for a, b in zip(jax.tree.leaves(clf.encoder.params),
                    jax.tree.leaves(clf2.encoder.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
