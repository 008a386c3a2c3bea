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


def test_device_cache_ring_and_gather():
    """DeviceEmbeddingCache: HBM-resident ring buffer; gather returns stored
    rows, eviction follows ring order, padded stores drop OOB rows."""
    import jax.numpy as jnp

    from adaptive_classifier_tpu.utils.cache import DeviceEmbeddingCache

    c = DeviceEmbeddingCache(capacity=3, dim=4)
    rows = jnp.arange(8, dtype=jnp.float32).reshape(2, 4)
    c.store(["a", "b"], 64, rows)
    hits, misses = c.lookup(["a", "b", "x"], 64)
    assert misses == [2] and [i for i, _ in hits] == [0, 1]
    got = np.asarray(c.gather([s for _, s in hits]))
    np.testing.assert_array_equal(got, np.asarray(rows))
    # padded store: only the first len(texts) rows land
    padded = jnp.full((4, 4), 9.0)
    c.store(["c"], 64, padded)   # 3 padding rows scatter OOB → dropped
    hits, _ = c.lookup(["c"], 64)
    np.testing.assert_array_equal(np.asarray(c.gather([hits[0][1]]))[0], 9.0)
    # fourth store wraps the ring: "a" (oldest slot) gets overwritten
    c.store(["d"], 64, jnp.full((1, 4), 7.0))
    _, misses = c.lookup(["a"], 64)
    assert misses == [0]
    _, misses = c.lookup(["b"], 64)
    assert misses == []
    # max_length is part of the key
    _, misses = c.lookup(["b"], 128)
    assert misses == [0]


def test_predict_batch_device_cache_consistency(tiny_classifier_factory):
    """predict_batch results are identical whether rows come from the device
    cache or fresh encoder passes (the serving fast path must not change
    predictions)."""
    clf = tiny_classifier_factory(embedding_cache_size=64)
    clf.add_examples(
        ["good stuff", "great work", "bad stuff", "awful work"],
        ["pos", "pos", "neg", "neg"],
    )
    queries = [f"query number {i}" for i in range(10)]
    r_miss = clf.predict_batch(queries, k=2)      # all encoder
    r_hit = clf.predict_batch(queries, k=2)       # all device-cache
    assert r_miss == r_hit
    mixed = queries[:5] + [f"fresh {i}" for i in range(5)] + queries[5:]
    r_mixed = clf.predict_batch(mixed, k=2)
    assert r_mixed[:5] == r_miss[:5] and r_mixed[10:] == r_miss[5:]
    stats = clf._dev_cache.stats()
    assert stats["hits"] >= 20


def test_cache_disabled():
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config={
        "embedding_cache_size": 0,
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32],
    })
    clf._get_embeddings(["x"])
    assert getattr(clf, "_emb_cache", None) is None
