"""Encoder & tokenizer tests.  HF-parity runs only when a local checkpoint
exists (the analog of the reference's ONNX-vs-PyTorch cosine tests,
test_onnx_phase1.py:68-96, with skipif gating like its optimum checks)."""

import numpy as np
import pytest

from adaptive_classifier_tpu.models.encoder import (
    Encoder, _find_local_checkpoint, config_for_model_name,
)
from adaptive_classifier_tpu.models.tokenizer import WordPieceTokenizer


class TestTokenizer:
    def test_hermetic_deterministic(self):
        t1 = WordPieceTokenizer.hermetic(4096)
        t2 = WordPieceTokenizer.hermetic(4096)
        assert t1.vocab == t2.vocab
        assert t1.tokenize("Hello, World!") == t2.tokenize("Hello, World!")

    def test_specials(self):
        t = WordPieceTokenizer.hermetic()
        ids = t.encode("hello")
        assert ids[0] == t.cls_id and ids[-1] == t.sep_id

    def test_ascii_no_unk(self):
        t = WordPieceTokenizer.hermetic()
        toks = t.tokenize("supercalifragilistic x9z!")
        assert t.unk_token not in toks

    def test_wordpiece_continuation(self):
        t = WordPieceTokenizer.hermetic()
        toks = t.tokenize("wording")
        assert toks[0] in t.vocab
        if len(toks) > 1:
            assert all(x.startswith("##") for x in toks[1:])

    def test_batch_padding(self):
        t = WordPieceTokenizer.hermetic()
        ids, mask = t(["short", "a much longer text with many words"], max_length=64)
        assert ids.shape == mask.shape
        assert ids.shape[0] == 2
        assert (mask.sum(axis=1) > 0).all()
        assert ids[0][mask[0] == 0].sum() == t.pad_id * (mask[0] == 0).sum()

    def test_truncation(self):
        t = WordPieceTokenizer.hermetic()
        ids = t.encode("word " * 1000, max_length=16)
        assert len(ids) <= 16

    def test_punctuation_split(self):
        t = WordPieceTokenizer.hermetic()
        assert "," in t.tokenize("hello,world")


class TestEncoder:
    def test_offline_deterministic(self):
        e1 = Encoder("prajjwal1/bert-tiny")
        e2 = Encoder("prajjwal1/bert-tiny")
        a = np.asarray(e1.embed(["hello world"]))
        b = np.asarray(e2.embed(["hello world"]))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_embeddings_normalized(self):
        e = Encoder("prajjwal1/bert-tiny")
        emb = np.asarray(e.embed(["one text", "another text entirely"]))
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)

    def test_text_dependence(self):
        e = Encoder("prajjwal1/bert-tiny")
        emb = np.asarray(e.embed(["completely different words", "zebra quantum banana"]))
        assert not np.allclose(emb[0], emb[1])

    def test_known_arch_dims(self):
        cfg = config_for_model_name("bert-base-uncased")
        assert (cfg.hidden_size, cfg.num_layers) == (768, 12)
        cfg = config_for_model_name("prajjwal1/bert-tiny")
        assert (cfg.hidden_size, cfg.num_layers) == (128, 2)
        cfg = config_for_model_name("some/unknown-model")
        assert cfg.hidden_size == 768

    def test_padding_invariance(self):
        """Embedding must not depend on batch padding companions."""
        e = Encoder("prajjwal1/bert-tiny")
        solo = np.asarray(e.embed(["the target text"]))
        padded = np.asarray(e.embed(["the target text", "x " * 50]))
        np.testing.assert_allclose(solo[0], padded[0], atol=2e-2)

    def test_fusedqkv_attention_parity(self):
        """bf16 path + packed-QKV Pallas attention == einsum attention."""
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu

        from adaptive_classifier_tpu.models.encoder import (
            EncoderConfig, embed_texts_device, init_params,
        )

        cfg = EncoderConfig(vocab_size=512, hidden_size=128, num_layers=2,
                            num_heads=2, intermediate_size=256,
                            max_position_embeddings=64)
        params = init_params(0, cfg)
        r = np.random.default_rng(7)
        B, S = 3, 40
        ids = jnp.asarray(r.integers(0, 500, (B, S)), jnp.int32)
        mask = np.ones((B, S), np.int32)
        mask[2, 17:] = 0
        mask = jnp.asarray(mask)
        base = np.asarray(embed_texts_device(params, ids, mask, cfg,
                                             jnp.float32))
        with pltpu.force_tpu_interpret_mode():
            fq = np.asarray(embed_texts_device(params, ids, mask, cfg,
                                               jnp.float32,
                                               attn_impl="fusedqkv"))
        np.testing.assert_allclose(fq, base, rtol=5e-3, atol=5e-3)

    def test_pool_layer_truncates_depth(self):
        """pool_layer=k == forward over an encoder whose params are
        physically truncated to the first k layers; 0 and num_layers are
        the identity."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from adaptive_classifier_tpu.models.encoder import (
            EncoderConfig, embed_texts_device, init_params,
        )

        cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=4,
                            num_heads=2, intermediate_size=128,
                            max_position_embeddings=64)
        params = init_params(0, cfg)
        r = np.random.default_rng(11)
        B, S = 2, 24
        ids = jnp.asarray(r.integers(0, 500, (B, S)), jnp.int32)
        mask = jnp.ones((B, S), jnp.int32)

        full = np.asarray(embed_texts_device(params, ids, mask, cfg,
                                             jnp.float32))
        same = np.asarray(embed_texts_device(
            params, ids, mask, dataclasses.replace(cfg, pool_layer=4),
            jnp.float32))
        np.testing.assert_allclose(same, full, rtol=1e-6, atol=1e-6)

        cfg2 = dataclasses.replace(cfg, pool_layer=2)
        k2 = np.asarray(embed_texts_device(params, ids, mask, cfg2,
                                           jnp.float32))
        trunc = dict(params)
        trunc["layers"] = jax.tree.map(lambda a: a[:2], params["layers"])
        manual = np.asarray(embed_texts_device(
            trunc, ids, mask,
            dataclasses.replace(cfg, num_layers=2), jnp.float32))
        np.testing.assert_allclose(k2, manual, rtol=1e-6, atol=1e-6)
        assert not np.allclose(k2, full, atol=1e-3)


@pytest.mark.skipif(
    _find_local_checkpoint("prajjwal1/bert-tiny") is None,
    reason="no local HF checkpoint available (offline CI)",
)
class TestHFParity:
    def test_embedding_cosine_parity(self):
        """Cosine similarity vs the torch forward > 0.99 (the reference's
        ONNX-parity threshold)."""
        import torch
        from transformers import AutoModel, AutoTokenizer

        name = "prajjwal1/bert-tiny"
        enc = Encoder(name, compute_dtype="float32")
        texts = ["the quick brown fox", "classification is fun"]
        ours = np.asarray(enc.embed(texts))

        tok = AutoTokenizer.from_pretrained(name)
        model = AutoModel.from_pretrained(name)
        model.eval()
        with torch.no_grad():
            inputs = tok(texts, return_tensors="pt", padding=True)
            out = model(**inputs).last_hidden_state[:, 0, :]
            theirs = torch.nn.functional.normalize(out, p=2, dim=1).numpy()
        cos = (ours * theirs).sum(axis=1)
        assert (cos > 0.99).all(), cos


class TestBPEAdapter:
    def test_bpe_tokenizer_adapter(self, tmp_path):
        """Build a tiny byte-level BPE with the Rust runtime, verify the
        adapter loads it and produces padded batches."""
        tokenizers = pytest.importorskip("tokenizers")
        from tokenizers import Tokenizer, models, pre_tokenizers, trainers

        tok = Tokenizer(models.BPE(unk_token="[UNK]"))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        trainer = trainers.BpeTrainer(
            vocab_size=300, special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        )
        tok.train_from_iterator(
            ["hello world", "the quick brown fox", "tokenizer test data"] * 20,
            trainer,
        )
        tok.save(str(tmp_path / "tokenizer.json"))

        from adaptive_classifier_tpu.models.hf_tokenizer_adapter import (
            try_load_hf_tokenizer,
        )

        adapter = try_load_hf_tokenizer(str(tmp_path))
        assert adapter is not None
        ids, mask = adapter(["hello world", "fox"], max_length=32)
        assert ids.shape == mask.shape and ids.dtype == np.int32
        assert ids[0, 0] == adapter.cls_id
        assert (mask.sum(axis=1) > 2).all()

    def test_bpe_adapter_pad_to_buckets(self, tmp_path):
        """The adapter accepts pad_to_buckets (both call sites —
        classifier._tokenize_chunk and Encoder.embed — pass SEQ_BUCKETS;
        a ModernBERT/BPE checkpoint must not TypeError on first embed)."""
        pytest.importorskip("tokenizers")
        from tokenizers import Tokenizer, models, pre_tokenizers, trainers

        tok = Tokenizer(models.BPE(unk_token="[UNK]"))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        trainer = trainers.BpeTrainer(
            vocab_size=300, special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        )
        tok.train_from_iterator(["hello world", "bucket pad test"] * 20, trainer)
        tok.save(str(tmp_path / "tokenizer.json"))

        from adaptive_classifier_tpu.models.hf_tokenizer_adapter import (
            try_load_hf_tokenizer,
        )

        adapter = try_load_hf_tokenizer(str(tmp_path))
        ids, mask = adapter(
            ["hello world", "hi"], max_length=512, pad_to_buckets=(32, 64, 128)
        )
        assert ids.shape[1] == 32  # shortest bucket covering the batch
        ids2, _ = adapter(["x " * 50], max_length=512, pad_to_buckets=(32, 64, 128))
        assert ids2.shape[1] in (64, 128)

    def test_wordpiece_json_not_hijacked(self, tmp_path):
        """WordPiece tokenizer.json files stay on the first-party path."""
        import json

        (tmp_path / "tokenizer.json").write_text(json.dumps({
            "model": {"type": "WordPiece", "vocab": {"[PAD]": 0}},
        }))
        from adaptive_classifier_tpu.models.hf_tokenizer_adapter import (
            try_load_hf_tokenizer,
        )

        assert try_load_hf_tokenizer(str(tmp_path)) is None
