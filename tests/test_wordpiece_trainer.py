"""First-party WordPiece vocab trainer tests (the training half of the
"HF tokenizers → first-party" replacement, SURVEY.md §2.2)."""

import pytest

from adaptive_classifier_tpu.models.tokenizer import WordPieceTokenizer
from adaptive_classifier_tpu.models.wordpiece_trainer import (
    basic_words, train_wordpiece_vocab,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "tokenizers build subword vocabularies from text corpora",
    "building vocabularies requires counting pairs of symbols",
    "the training objective merges the highest likelihood pair",
    "subword units cover unseen words through their pieces",
] * 40


def test_basic_words_matches_runtime_tokenizer():
    wp = WordPieceTokenizer({t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]"])})
    for text in CORPUS[:5] + ["Hello, World! D'accord... (test)"]:
        assert basic_words(text) == wp._basic_tokenize(text)


def test_trained_vocab_structure():
    vocab = train_wordpiece_vocab(CORPUS, 300)
    assert vocab[:5] == ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    assert len(vocab) <= 300
    assert len(set(vocab)) == len(vocab)         # no duplicates
    assert any(t.startswith("##") for t in vocab)  # continuations exist
    # frequent whole words get merged into single tokens
    assert "the" in vocab


def test_trained_vocab_tokenizes_with_low_unk():
    """The trained vocab drives OUR runtime with near-zero UNKs on held-out
    text from the same domain (coverage parity with the Rust trainer)."""
    vocab = train_wordpiece_vocab(CORPUS, 400)
    wp = WordPieceTokenizer({t: i for i, t in enumerate(vocab)})
    held_out = "counting subword pieces covers the corpora text quickly"
    ids = wp.encode(held_out, max_length=64)
    unk_frac = sum(1 for i in ids if i == wp.unk_id) / len(ids)
    assert unk_frac == 0.0, unk_frac
    # alphabet fallback: an unseen word of seen characters tokenizes to
    # pieces rather than UNK
    ids2 = wp.encode("foxbrown", max_length=16)
    assert wp.unk_id not in ids2[1:-1]
    assert len(ids2) > 3  # [CLS] + >1 pieces + [SEP]


def test_coverage_close_to_rust_trainer():
    """Token-count efficiency within 25% of the Rust WordPiece trainer on
    held-out text (same budget, same corpus)."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, trainers

    budget = 350
    ours = train_wordpiece_vocab(CORPUS, budget)
    wp_ours = WordPieceTokenizer({t: i for i, t in enumerate(ours)})

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = normalizers.Sequence(
        [normalizers.NFD(), normalizers.Lowercase(), normalizers.StripAccents()])
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    tok.train_from_iterator(CORPUS, trainers.WordPieceTrainer(
        vocab_size=budget, special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"],
        continuing_subword_prefix="##"))

    held_out = ("the lazy fox counts subword pieces while building "
                "vocabularies over text corpora through training")
    n_ours = len(wp_ours.encode(held_out, max_length=128))
    n_rust = len(tok.encode(held_out).ids)
    assert n_ours <= n_rust * 1.25, (n_ours, n_rust)
