"""Hashed TF-IDF lexical channel (lexical.py) — vectorizer contract,
auto-weight selection, classifier integration, persistence round trip.

Beyond-reference capability: the reference has no counterpart (its quality
is capped by the frozen encoder, reference classifier.py:58-85)."""

import numpy as np
import pytest

from adaptive_classifier_tpu.lexical import AUTO_WEIGHT_GRID, HashedTfidf


def test_dim_must_be_lane_multiple():
    with pytest.raises(ValueError):
        HashedTfidf(dim=1000)


def test_transform_deterministic_unit_norm():
    v = HashedTfidf(dim=256, weight=1.0).fit(
        ["the quick brown fox", "jumped over the lazy dog"])
    X1 = v.transform(["quick brown dog", ""])
    X2 = v.transform(["quick brown dog", ""])
    np.testing.assert_array_equal(X1, X2)
    assert X1.shape == (2, 256)
    np.testing.assert_allclose(np.linalg.norm(X1[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(X1[1], 0.0)   # empty text → zero row, no NaN


def test_transform_before_fit_raises():
    with pytest.raises(RuntimeError):
        HashedTfidf(dim=128).transform(["x"])


def test_idf_downweights_common_grams():
    """A gram present in every doc must contribute less than a rare one."""
    v = HashedTfidf(dim=512, weight=1.0).fit(
        [f"common filler text number {i}" for i in range(50)]
        + ["zyzzyva"])
    x_common = v.transform(["common"])[0]
    x_rare = v.transform(["zyzzyva"])[0]
    # both unit-norm single-gram rows; compare pre-normalization magnitude
    # via the idf table directly
    assert v._idf["zyzzyva"] > v._idf["common"]


def test_serialization_roundtrip_exact():
    v = HashedTfidf(dim=256, weight="auto").fit(
        ["alpha beta", "beta gamma", "gamma delta"])
    v.weight = 2.0
    d = v.to_dict()
    v2 = HashedTfidf.from_dict(d)
    assert v2.weight == 2.0 and v2.fitted
    q = ["alpha gamma epsilon"]
    np.testing.assert_array_equal(v.transform(q), v2.transform(q))


def test_compose_unit_norm():
    v = HashedTfidf(dim=128, weight=2.0).fit(["a b c"])
    enc = np.random.default_rng(0).normal(size=(4, 32)).astype(np.float32)
    enc /= np.linalg.norm(enc, axis=1, keepdims=True)
    lex = v.transform(["a b", "c", "a c", "b"])
    full = v.compose(enc, lex)
    assert full.shape == (4, 160)
    np.testing.assert_allclose(np.linalg.norm(full, axis=1), 1.0, atol=1e-5)


def test_resolve_weight_picks_lexical_when_encoder_is_noise():
    rng = np.random.default_rng(3)
    n = 40
    y = np.array([i % 2 for i in range(n)])
    enc = rng.normal(size=(n, 16)).astype(np.float32)       # pure noise
    enc /= np.linalg.norm(enc, axis=1, keepdims=True)
    lex = np.zeros((n, 128), np.float32)                     # separable
    lex[y == 0, 3] = 1.0
    lex[y == 1, 7] = 1.0
    v = HashedTfidf(dim=128, weight="auto")
    w = v.resolve_weight(enc, lex, y)
    assert w > 0.0
    assert v.weight == w


def test_resolve_weight_avoids_harmful_lexical_noise():
    """When the lexical view is noise, weights strong enough to flip val
    predictions must lose the sweep (harmless small weights may tie and
    win by the nearest-1.0 preference — that cannot hurt accuracy)."""
    rng = np.random.default_rng(4)
    n = 40
    y = np.array([i % 2 for i in range(n)])
    enc = np.zeros((n, 16), np.float32)
    enc[y == 0, 0] = 0.1                                     # weak separation
    enc[y == 1, 1] = 0.1
    enc += 0.01 * rng.normal(size=enc.shape).astype(np.float32)
    lex = rng.normal(size=(n, 128)).astype(np.float32)       # pure noise
    lex /= np.linalg.norm(lex, axis=1, keepdims=True)
    v = HashedTfidf(dim=128, weight="auto")
    w = v.resolve_weight(enc, lex, y)
    # verify the chosen weight does not val-hurt vs lexical-off
    def val_acc(w_):
        f = np.concatenate([enc, w_ * lex], axis=1)
        fit = np.arange(n) % 2 == 0
        cents = np.stack([f[fit & (y == c)].mean(0) for c in (0, 1)])
        q = f[~fit]
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        return float((d2.argmin(1) == y[~fit]).mean())
    assert val_acc(w) >= val_acc(0.0) - 1e-9


def test_resolve_weight_grid_contains_off():
    assert 0.0 in AUTO_WEIGHT_GRID


# ---------------------------------------------------------------------------
# gram kinds (round 3): char 3-5-grams + auto gram-type selection
# ---------------------------------------------------------------------------


def test_char_grams_shape_and_typo_overlap():
    """A one-letter typo must keep most char grams (the robustness the
    kind exists for) while losing the word gram entirely."""
    from adaptive_classifier_tpu.lexical import _grams

    clean = set(_grams("a wonderful movie", "char"))
    typo = set(_grams("a wonderfull movie", "char"))
    overlap = len(clean & typo) / len(clean)
    assert overlap > 0.6
    w_clean = set(_grams("a wonderful movie", "word"))
    w_typo = set(_grams("a wonderfull movie", "word"))
    assert "wonderful" in w_clean and "wonderful" not in w_typo


def test_wordchar_is_union():
    from adaptive_classifier_tpu.lexical import _grams

    t = "quick brown fox"
    both = _grams(t, "wordchar")
    assert set(_grams(t, "word")) <= set(both)
    assert set(_grams(t, "char")) <= set(both)


def test_invalid_gram_kind_raises():
    with pytest.raises(ValueError):
        HashedTfidf(dim=128, grams="bigram")


def test_fit_with_auto_grams_raises():
    with pytest.raises(RuntimeError):
        HashedTfidf(dim=128, grams="auto").fit(["x y"])


def test_resolve_config_picks_char_for_subword_task():
    """Classes that differ only by a word-internal affix are invisible to
    word grams on held-out vocabulary — auto must select char grams."""
    rng = np.random.default_rng(0)
    stems = ["instal", "configur", "deploy", "renam", "restart", "resiz",
             "rebuild", "reload", "migrat", "compil", "packag", "updat"]
    # the class lives in a word-INTERNAL suffix of an otherwise held-out
    # token: word grams on the val fold see only unseen tokens, char grams
    # share the suffix grams across folds
    texts = [s + suf for s in stems for suf in ("ingx", "edly")]
    labels = [i % 2 for s in stems for i in range(2)]
    enc = rng.normal(size=(len(texts), 16)).astype(np.float32)  # noise
    enc /= np.linalg.norm(enc, axis=1, keepdims=True)
    v = HashedTfidf(dim=1024, weight="auto", grams="auto")
    v.resolve_config(enc, texts, labels)
    assert v.ready
    assert v.grams in ("char", "wordchar")
    assert v.weight > 0.0


def test_resolve_config_fixed_grams_sweeps_weight_only():
    rng = np.random.default_rng(1)
    texts = ["billing invoice charge", "invoice billing payment",
             "shipping parcel delivery", "parcel shipping tracking"] * 3
    labels = [0, 0, 1, 1] * 3
    enc = rng.normal(size=(len(texts), 8)).astype(np.float32)
    enc /= np.linalg.norm(enc, axis=1, keepdims=True)
    v = HashedTfidf(dim=512, weight="auto", grams="word")
    v.resolve_config(enc, texts, labels)
    assert v.grams == "word" and v.ready


def test_grams_persistence_roundtrip_and_backcompat():
    v = HashedTfidf(dim=256, weight=2.0, grams="char").fit(["alpha beta"])
    v2 = HashedTfidf.from_dict(v.to_dict())
    assert v2.grams == "char"
    q = ["alphabet gamma"]
    np.testing.assert_array_equal(v.transform(q), v2.transform(q))
    # pre-round-3 checkpoints have no "grams" key → word grams
    d = v.to_dict()
    del d["grams"]
    assert HashedTfidf.from_dict(d).grams == "word"


# ---------------------------------------------------------------------------
# classifier integration (offline random encoder: the DENSE channel carries
# no semantics, so lexically separable tasks isolate the lexical channel)
# ---------------------------------------------------------------------------

CFG = {"train_size_buckets": [64], "class_capacity_buckets": [8],
       "example_capacity_buckets": [32], "embedding_cache_size": 0,
       "lexical_dim": 256}

TRAIN = (
    ["billing invoice charge payment overdue", "invoice billing payment due",
     "charge my card billing payment", "billing overdue invoice reminder",
     "shipping parcel delivery tracking", "deliver my parcel tracking number",
     "shipping delivery address tracking", "parcel shipping delayed delivery"],
    ["billing"] * 4 + ["shipping"] * 4,
)
TEST = (
    ["payment charge invoice question", "tracking my delivery parcel status"],
    ["billing", "shipping"],
)


def _mk(cfg=None):
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config=cfg or CFG, seed=1)
    clf.add_examples(*TRAIN)
    return clf


def test_classifier_lexical_dims_and_readiness():
    clf = _mk()
    assert clf.embedding_dim == clf.encoder.hidden_size + 256
    assert clf.lexical.fitted
    assert isinstance(clf.lexical.weight, float)
    emb = clf._get_embeddings(["billing question"])
    assert emb.shape == (1, clf.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(emb[0]), 1.0, atol=1e-4)


def test_classifier_lexical_beats_dense_on_lexical_task():
    """With a random (offline) encoder the dense channel is semantic noise;
    the lexical channel must carry the vocabulary-separable task."""
    clf = _mk()
    assert clf.lexical.weight > 0.0
    preds = clf.predict_batch(TEST[0], k=1)
    got = [p[0][0] for p in preds]
    assert got == TEST[1], got


def test_classifier_predict_before_first_add_raises_cleanly():
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config=CFG, seed=1)
    # no classes yet → empty result, no crash (reference semantics)
    assert clf.predict_batch(["x"], k=1) == [[]]


def test_single_class_first_batch_falls_back_to_default_weight():
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config=CFG, seed=1)
    clf.add_examples(["billing invoice charge"] * 3, ["billing"] * 3)
    assert clf.lexical.weight == 1.0


def test_lexical_save_load_roundtrip_exact(tmp_path):
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = _mk()
    path = tmp_path / "ckpt"
    clf.save(str(path))
    assert (path / "lexical.json").exists()
    clf2 = AdaptiveClassifier.load(str(path))
    assert clf2.lexical.fitted
    assert clf2.lexical.weight == clf.lexical.weight
    q = ["invoice payment overdue charge"]
    np.testing.assert_allclose(clf._get_embeddings(q),
                               clf2._get_embeddings(q), atol=1e-5)
    p1, p2 = clf.predict_batch(q, k=2), clf2.predict_batch(q, k=2)
    assert [l for l, _ in p1[0]] == [l for l, _ in p2[0]]
    for (_, a), (_, b) in zip(p1[0], p2[0]):
        assert abs(a - b) < 1e-4


def test_lexical_continual_learning_after_load(tmp_path):
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = _mk()
    path = tmp_path / "ckpt"
    clf.save(str(path))
    clf2 = AdaptiveClassifier.load(str(path))
    clf2.add_examples(
        ["refund money back return", "return item refund money"],
        ["refund"] * 2)
    assert clf2.predict("refund my money", k=1)[0][0] == "refund"
    # old classes survive (IDF frozen → no representation drift)
    assert clf2.predict_batch(TEST[0], k=1)[0][0][0] == "billing"


def test_predict_document_with_lexical():
    clf = _mk()
    doc = " ".join(TRAIN[0][:4]) * 30   # long billing-vocabulary document
    out = clf.predict_document(doc, k=2, chunk_tokens=32)
    assert out and out[0][0] == "billing"


def test_lexical_off_is_exact_reference_path():
    """lexical_dim=0 (default) must leave the embedding space untouched."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    base_cfg = {k: v for k, v in CFG.items() if k != "lexical_dim"}
    a = AdaptiveClassifier("prajjwal1/bert-tiny", config=base_cfg, seed=1)
    assert a.lexical is None
    assert a.embedding_dim == a.encoder.hidden_size


def test_fold_cap_many_singleton_classes():
    """A fold can exceed the 2048-row solve cap while the batch has fewer
    than 4096 rows (half_b also holds every singleton-class row); the cap
    must clamp to the batch instead of raising (ADVICE r3, medium)."""
    from adaptive_classifier_tpu.lexical import _fold_machinery

    labels = list(range(2500))            # 2500 singleton classes
    half_a, half_b, fold_acc = _fold_machinery(labels)
    assert int(half_b.sum()) == 2500      # all singletons land in half_b
    f = np.random.default_rng(0).normal(size=(2500, 8)).astype(np.float32)
    # the scorer itself must run without the ValueError from rng.choice
    acc = fold_acc(f, half_b, half_a)
    assert 0.0 <= acc <= 1.0


def test_skeleton_grams_typo_invariant():
    """Skeleton grams are EXACTLY invariant to in-word adjacent-character
    swaps (the adv-SST2 / human-typo attack family) — the transform of a
    typo'd text equals the transform of the clean text."""
    from adaptive_classifier_tpu.lexical import HashedTfidf, _grams, _skeleton

    assert _skeleton("wonderful") == _skeleton("wodnerful")  # swapped n/d
    assert _skeleton("wonderful") == _skeleton("wonedrful")
    assert _skeleton("hi") == "hi"                           # short: verbatim

    clean = "the film was absolutely wonderful and heartwarming"
    typo = "the film was absolutely wodnerful and heartwraming"
    assert _grams(clean, "skel") == _grams(typo, "skel")

    v = HashedTfidf(1024, weight=1.0, grams="skel").fit([clean, typo])
    rows = v.transform([clean, typo])
    np.testing.assert_allclose(rows[0], rows[1])


def test_charskel_namespaces_do_not_collide():
    """Skeleton grams carry a '#' prefix so a skeleton form can never
    alias a plain word gram in the shared hash space."""
    from adaptive_classifier_tpu.lexical import _grams

    g = _grams("abcd efgh", "charskel")
    assert "#abcd" in g and "#efgh" in g and "#abcd #efgh" in g
    assert all(not x.startswith("#") or x.lstrip("#")[0].isalnum()
               for x in g)


def test_auto_probe_sweeps_skeleton_kinds():
    """grams='auto' includes the skeleton kinds in the sweep."""
    from adaptive_classifier_tpu.lexical import GRAM_KINDS

    assert "skel" in GRAM_KINDS and "charskel" in GRAM_KINDS
