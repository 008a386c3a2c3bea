"""First-party byte-level BPE parity vs the Rust tokenizers runtime."""

import numpy as np
import pytest

from adaptive_classifier_tpu.models.bpe import (
    ByteLevelBPE, bytes_to_unicode, gpt2_pretokenize,
)

CORPUS = [
    "hello world",
    "The quick brown fox jumps over the lazy dog!",
    "it's a tokenizer's test, isn't it?",
    "numbers 12345 and mixed abc123 def",
    "  leading spaces and   runs   of spaces",
    "punctuation!!! ... --- ??? ,,,",
    "CamelCase and UPPERCASE and lowercase",
    "unicode: café naïve résumé 日本語",
]


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_pretokenize_roundtrip():
    for text in CORPUS:
        assert "".join(gpt2_pretokenize(text)) == text


@pytest.fixture(scope="module")
def trained_pair(tmp_path_factory):
    """Train a small byte-level BPE with the Rust runtime; load it with both
    implementations."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=True)
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS * 30, trainer)
    p = tmp_path_factory.mktemp("bpe")
    tok.save(str(p / "tokenizer.json"))
    ours = ByteLevelBPE.from_tokenizer_json(str(p))
    return tok, ours


def test_token_for_token_parity(trained_pair):
    rust, ours = trained_pair
    for text in CORPUS:
        expect = rust.encode(text).ids
        got = ours.encode_text(text)
        assert got == expect, (text, got, expect)


def test_batch_interface(trained_pair):
    _, ours = trained_pair
    ids, mask = ours(["hello world", "fox"], max_length=32, pad_to_buckets=(8, 16))
    assert ids.shape == mask.shape
    assert ids.dtype == np.int32
    assert ids[0, 0] == ours.cls_id
    assert (mask.sum(axis=1) >= 3).all()


def test_specials_resolved(trained_pair):
    _, ours = trained_pair
    assert ours.cls_id == 2  # [CLS] trained as special id 2
    assert ours.sep_id == 3
    assert ours.pad_id == 0


def test_adapter_falls_back_to_first_party(trained_pair, tmp_path, monkeypatch):
    """With the Rust runtime unavailable, BPE checkpoints load through the
    first-party implementation."""
    rust, _ = trained_pair
    rust.save(str(tmp_path / "tokenizer.json"))

    import adaptive_classifier_tpu.models.hf_tokenizer_adapter as ada

    class Boom:
        def __init__(self, *a, **k):
            raise ImportError("no tokenizers")

    monkeypatch.setattr(ada, "HFTokenizerAdapter", Boom)
    tok = ada.try_load_hf_tokenizer(str(tmp_path))
    assert isinstance(tok, ByteLevelBPE)
    ids, mask = tok(["hello world"], max_length=16)
    assert ids.shape[0] == 1


def test_fuzz_parity_with_rust(trained_pair):
    """Property-based: first-party BPE == Rust on arbitrary printable ASCII."""
    from hypothesis import given, settings, strategies as st

    rust, ours = trained_pair

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                   max_size=60))
    def check(text):
        assert ours.encode_text(text) == rust.encode(text).ids

    check()


def test_fuzz_pretokenize_roundtrip():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=60))
    def check(text):
        assert "".join(gpt2_pretokenize(text)) == text

    check()
