"""Native C++ component tests: tokenizer parity vs Python, flat index parity
vs numpy brute force (the FAISS-analog verification oracle)."""

import numpy as np
import pytest

from adaptive_classifier_tpu import native
from adaptive_classifier_tpu.models.tokenizer import WordPieceTokenizer

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)

CORPUS = [
    "Hello, World!",
    "the quick brown fox jumps over the lazy dog",
    "refund my payment please -- URGENT!!!",
    "x" * 150,  # exceeds max_chars_per_word → [UNK]
    "punctuation,everywhere.and;more:here",
    "numbers 123 456 and mixed a1b2c3",
    "",
    "   leading and trailing   ",
]


class TestNativeTokenizer:
    def test_parity_with_python(self):
        tok = WordPieceTokenizer.hermetic(4096)
        nat = native.NativeWordPiece(tok.vocab, tok.do_lower_case)
        for text in CORPUS:
            py = tok.encode(text, max_length=64)
            cc = nat.encode(text, max_length=64).tolist()
            assert cc == py, text

    def test_batch_matches_single(self):
        tok = WordPieceTokenizer.hermetic(4096)
        nat = native.NativeWordPiece(tok.vocab, tok.do_lower_case)
        mat, lens = nat.encode_batch(CORPUS, 64)
        for i, text in enumerate(CORPUS):
            single = nat.encode(text, 64)
            assert mat[i, : lens[i]].tolist() == single.tolist()

    def test_tokenizer_uses_native_fast_path(self):
        tok = WordPieceTokenizer.hermetic(4096)
        ids, mask = tok(["hello world", "foo bar baz"], max_length=32)
        assert tok._get_native() is not None  # built and used on this machine
        tok2 = WordPieceTokenizer.hermetic(4096)
        tok2._native_tried = True  # force the pure-Python path
        ids2, mask2 = tok2(["hello world", "foo bar baz"], max_length=32)
        np.testing.assert_array_equal(ids, ids2)
        np.testing.assert_array_equal(mask, mask2)


class TestFlatIndex:
    def test_search_matches_numpy(self):
        r = np.random.default_rng(0)
        d, n, nq, k = 32, 100, 8, 10
        data = r.standard_normal((n, d)).astype(np.float32)
        q = r.standard_normal((nq, d)).astype(np.float32)
        idx = native.FlatIndexL2(d)
        idx.add(data)
        assert idx.ntotal == n
        dist, ids = idx.search(q, k)
        d2 = ((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
        for b in range(nq):
            expect = np.argsort(d2[b], kind="stable")[:k]
            np.testing.assert_array_equal(ids[b], expect)
            np.testing.assert_allclose(dist[b], d2[b][expect], rtol=1e-4, atol=1e-4)

    def test_k_exceeds_ntotal(self):
        idx = native.FlatIndexL2(8)
        idx.add(np.ones((2, 8), np.float32))
        dist, ids = idx.search(np.zeros((1, 8), np.float32), 5)
        assert (ids[0, 2:] == -1).all()

    def test_remove_and_reset(self):
        idx = native.FlatIndexL2(4)
        idx.add(np.eye(4, dtype=np.float32))
        idx.remove(0)
        assert idx.ntotal == 3
        idx.reset()
        assert idx.ntotal == 0

    def test_matches_device_knn(self):
        """FAISS-analog vs the device kNN path: identical neighbor sets."""
        import jax.numpy as jnp

        from adaptive_classifier_tpu.ops import knn

        r = np.random.default_rng(3)
        d, n, nq, k = 16, 24, 6, 5
        protos = r.standard_normal((n, d)).astype(np.float32)
        protos /= np.linalg.norm(protos, axis=1, keepdims=True)
        q = r.standard_normal((nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        idx = native.FlatIndexL2(d)
        idx.add(protos)
        _, ids_native = idx.search(q, k)

        sims = knn.masked_sims_ref(jnp.asarray(q), jnp.asarray(protos),
                                   jnp.ones(n, bool))
        _, ids_device = knn.topk_scores(sims, jnp.ones(n, bool), k)
        np.testing.assert_array_equal(np.sort(ids_native, axis=1),
                                      np.sort(np.asarray(ids_device), axis=1))


class TestNativeTokenizerFuzz:
    def test_fuzz_ascii_parity(self):
        """Property-based: native C++ WordPiece == Python on arbitrary
        printable-ASCII strings."""
        from hypothesis import given, settings, strategies as st

        tok = WordPieceTokenizer.hermetic(4096)
        nat = native.NativeWordPiece(tok.vocab, tok.do_lower_case)

        @settings(max_examples=200, deadline=None)
        @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                       max_size=80))
        def check(text):
            assert nat.encode(text, 64).tolist() == tok.encode(text, max_length=64)

        check()

    def test_fuzz_control_char_parity(self):
        """Control characters (0x00-0x1F, 0x7F) must DELETE (joining their
        neighbors) like the Python arbiter's _clean — regression: the
        native path used to split words on them (and kept DEL in-word)."""
        from hypothesis import given, settings, strategies as st

        tok = WordPieceTokenizer.hermetic(4096)
        nat = native.NativeWordPiece(tok.vocab, tok.do_lower_case)

        @settings(max_examples=150, deadline=None)
        @given(st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=127),
                       max_size=60))
        def check(text):
            assert nat.encode(text, 64).tolist() == tok.encode(text, max_length=64)

        check()

    def test_control_chars_join_words(self):
        tok = WordPieceTokenizer.hermetic(4096)
        nat = native.NativeWordPiece(tok.vocab, tok.do_lower_case)
        assert nat.encode("ab\x0bcd", 16).tolist() == \
            tok.encode("abcd", max_length=16)
        assert nat.encode("ab\x7fcd", 16).tolist() == \
            tok.encode("abcd", max_length=16)

    def test_max_length_below_two_rejected(self):
        import pytest

        tok = WordPieceTokenizer.hermetic(4096)
        nat = native.NativeWordPiece(tok.vocab, tok.do_lower_case)
        with pytest.raises(ValueError):
            nat.encode("hello", 1)
        with pytest.raises(ValueError):
            nat.encode_batch(["hello"], 0)


class TestNativeTokenizerUnicode:
    """The native tokenizer is exact for ALL UTF-8 text (round 2 it was
    ASCII-only and any non-ASCII char dropped the whole batch to Python —
    a silent order-of-magnitude throughput cliff for real-world traffic)."""

    CASES = [
        "Café déjà-vu — naïve façade; Zürich coöperate",
        "ΑΣ ΟΔΥΣΣΕΥΣ σοφός",                 # Greek incl. Final_Sigma rule
        "Привет мир, это тест кириллицы",
        "日本語のテスト中文测试한국어",          # CJK split + Hangul NFD
        "emoji 😀 test 🎉 done",
        "ligature ﬁle straße İstanbul",
        "zero\x00width​space\xa0nbsp",   # delete/fold classes
        "ｆｕｌｌｗｉｄｔｈ　ｔｅｘｔ",
    ]

    def _pair(self):
        tok = WordPieceTokenizer.hermetic(4096)
        nat = native.NativeWordPiece(tok.vocab, tok.do_lower_case)
        return tok, nat

    def test_curated_unicode_parity(self):
        tok, nat = self._pair()
        for s in self.CASES:
            assert nat.encode(s, 128).tolist() == tok.encode(s, max_length=128), s

    def test_fuzz_unicode_parity(self):
        """Property-based: native == Python over mixed scripts (Latin-ext,
        Greek, Cyrillic, CJK, Hangul syllables, symbols, format chars)."""
        from hypothesis import given, settings, strategies as st

        tok, nat = self._pair()
        alphabet = st.one_of(
            st.characters(min_codepoint=32, max_codepoint=126),
            st.characters(min_codepoint=0xC0, max_codepoint=0x17F),
            st.characters(min_codepoint=0x370, max_codepoint=0x3FF),
            st.characters(min_codepoint=0x400, max_codepoint=0x45F),
            st.characters(min_codepoint=0x4E00, max_codepoint=0x4EFF),
            st.characters(min_codepoint=0xAC00, max_codepoint=0xACFF),
            st.sampled_from("😀🎉ßﬁİΣς​\xa0　"),
        )

        @settings(max_examples=300, deadline=None)
        @given(st.text(alphabet=alphabet, max_size=60))
        def check(text):
            assert nat.encode(text, 96).tolist() == tok.encode(text, max_length=96)

        check()

    def test_mixed_batch_stays_native(self):
        """A batch mixing ASCII and non-ASCII rows must produce the same
        matrix as per-row Python encoding (the __call__ fast path no longer
        falls back)."""
        tok, nat = self._pair()
        texts = ["plain ascii row", "café déjà vu", "日本語テスト", "ΑΣ σοφός"]
        ids, mask = tok(texts, max_length=64)
        for i, t in enumerate(texts):
            ref = tok.encode(t, max_length=64)
            assert ids[i, : len(ref)].tolist() == ref
            assert mask[i, : len(ref)].all() and not mask[i, len(ref):].any()

    def test_batch_thread_pool_parity(self):
        """Large batches route through the native thread pool — output must
        be identical to single encode calls."""
        tok, nat = self._pair()
        texts = [f"pooled row {i} café {i} 日本 {i}" for i in range(256)]
        mat, lens = nat.encode_batch(texts, 48)
        for i, t in enumerate(texts):
            assert mat[i, : lens[i]].tolist() == nat.encode(t, 48).tolist()
