"""Embedding cache tests."""

import numpy as np

from adaptive_classifier_tpu.utils.cache import EmbeddingCache


def test_lru_basic():
    c = EmbeddingCache(capacity=2)
    cached, misses = c.lookup(["a", "b"], 64)
    assert misses == [0, 1]
    c.store(["a", "b"], 64, np.arange(8).reshape(2, 4).astype(np.float32))
    cached, misses = c.lookup(["a", "b"], 64)
    assert misses == []
    np.testing.assert_array_equal(cached[0], [0, 1, 2, 3])
    # eviction: adding "c" evicts least-recently-used
    _ = c.lookup(["b"], 64)  # touch b
    c.store(["c"], 64, np.ones((1, 4), np.float32))
    _, misses = c.lookup(["a"], 64)
    assert misses == [0]
    _, misses = c.lookup(["b", "c"], 64)
    assert misses == []


def test_max_length_keying():
    c = EmbeddingCache(capacity=4)
    c.store(["a"], 64, np.ones((1, 4), np.float32))
    _, misses = c.lookup(["a"], 128)
    assert misses == [0]


def test_classifier_uses_cache(synth_classifier_factory):
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config={
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32], "embedding_cache_size": 128,
    })
    e1 = clf._get_embeddings(["hello world", "foo bar"])
    e2 = clf._get_embeddings(["hello world", "foo bar"])
    np.testing.assert_array_equal(e1, e2)
    stats = clf._emb_cache.stats()
    assert stats["hits"] == 2
    assert stats["misses"] == 2
    # mixed hit/miss batch assembles in the right order
    e3 = clf._get_embeddings(["new text", "hello world"])
    np.testing.assert_array_equal(e3[1], e1[0])


def test_cache_disabled():
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config={
        "embedding_cache_size": 0,
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32],
    })
    clf._get_embeddings(["x"])
    assert getattr(clf, "_emb_cache", None) is None
