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


def test_int8_mode_save_does_not_double_quantize(tmp_path):
    """An int8-mode encoder's params are ALREADY the runtime int8 tree —
    save must store it verbatim (format=runtime_int8_tree), not re-quantize
    the int8 leaves into '.int8.int8' garbage."""
    from adaptive_classifier_tpu import AdaptiveClassifier
    from safetensors.numpy import load_file

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config={
        "quantization": "int8",
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32], "embedding_cache_size": 0,
    })
    if clf.encoder.quantization != "int8":
        import pytest
        pytest.skip("int8 path not engaged on this backend")
    clf.add_examples(["hello billing", "reset password"], ["a", "b"])
    p = tmp_path / "m"
    clf.save(str(p))
    cfg = json.loads((p / "quantized" / "quantize_config.json").read_text())
    assert cfg["format"] == "runtime_int8_tree"
    tensors = load_file(str(p / "quantized" / "model_int8.safetensors"))
    assert not any(".int8.int8" in k for k in tensors)
    assert any(k.endswith("qkv_w.int8") for k in tensors)


def test_quantized_export_carries_vocab(tmp_path, synth_classifier_factory):
    """Restoring pretrained weights without their vocab silently pairs them
    with the hermetic tokenizer's unrelated ids — the export must include
    vocab.txt whenever the tokenizer has a vocabulary."""
    clf = synth_classifier_factory()
    clf.add_examples(["a:1", "b:1"], ["a", "b"])
    clf.save(str(tmp_path / "m"))
    vocab_file = tmp_path / "m" / "quantized" / "vocab.txt"
    assert vocab_file.exists()
    lines = vocab_file.read_text().splitlines()
    assert lines[:5] == ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]


def test_restore_params_rebuilds_closures():
    """encoder.restore_params must rebuild the jitted embed closure so a
    changed config (e.g. pooling) actually takes effect — assigning
    .config alone leaves the old closure's captured cfg."""
    from adaptive_classifier_tpu.models.encoder import Encoder, EncoderConfig

    enc = Encoder("prajjwal1/bert-tiny")
    e_cls = np.asarray(enc.embed(["hello world of testing"]))
    new_cfg = EncoderConfig(**{**enc.config.__dict__, "pooling": "mean"})
    enc.restore_params(enc.params, config=new_cfg)
    e_mean = np.asarray(enc.embed(["hello world of testing"]))
    assert not np.allclose(e_cls, e_mean)


def test_per_output_channel_scales():
    """quantize_tree reduces over the contraction axis, not the whole
    matrix: a [L, in, out] stack gets scale [L, out]."""
    from adaptive_classifier_tpu.quantization import (
        dequantize_tree, quantize_tree)

    rng = np.random.default_rng(0)
    w = rng.standard_normal((2, 64, 32)).astype(np.float32)
    w[:, :, 0] *= 100.0  # outlier column must not crush other columns
    tensors, manifest = quantize_tree({"layers": {"ffn_in_w": w}})
    assert tensors["layers/ffn_in_w.scale"].shape == (2, 32)
    back = np.asarray(dequantize_tree(tensors)["layers"]["ffn_in_w"])
    err = np.abs(back - w).max(axis=(0, 1))
    # non-outlier columns keep fine resolution despite the outlier
    assert err[1:].max() < 0.05


def test_int8_restore_when_base_checkpoint_missing(tmp_path):
    """The original crash: save on a machine WITH the base checkpoint, load
    on one WITHOUT it while the encoder resolves to the int8 path — the
    restored params must be the runtime int8 tree the jitted closure
    expects (a float tree KeyErrors on 'qkv_w.int8' at first predict)."""
    import shutil
    from pathlib import Path

    from adaptive_classifier_tpu import AdaptiveClassifier

    src = Path(__file__).resolve().parent.parent / "checkpoints" / "ac-tiny"
    if not (src / "model.safetensors").exists():
        import pytest
        pytest.skip("ac-tiny checkpoint not built")
    ckpt = tmp_path / "enc"
    shutil.copytree(src, ckpt)
    cfg = {"quantization": "int8", "train_size_buckets": [64],
           "class_capacity_buckets": [8], "example_capacity_buckets": [32],
           "embedding_cache_size": 0}
    clf = AdaptiveClassifier(str(ckpt), config=cfg)
    clf.add_examples(["the billing charge is wrong", "reset my password"],
                     ["billing", "password"])
    before = clf.predict("wrong charge on my bill", k=2)
    out = tmp_path / "saved"
    clf.save(str(out))

    shutil.rmtree(ckpt)   # simulate the machine without the base checkpoint
    clf2 = AdaptiveClassifier.load(str(out))
    assert clf2.encoder.pretrained  # restored from the int8 export
    after = clf2.predict("wrong charge on my bill", k=2)  # must not crash
    assert after[0][0] == before[0][0]
