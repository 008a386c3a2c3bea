"""Prototype memory tests (reference analog: tests/test_memory.py)."""

import numpy as np
import pytest

from adaptive_classifier_tpu import Example, ModelConfig, PrototypeMemory

DIM = 16


def cfg(**kw):
    base = {
        "class_capacity_buckets": [4, 8],
        "example_capacity_buckets": [8, 16, 32],
        "max_examples_per_class": 10,
        "example_capacity_slack": 8,
    }
    base.update(kw)
    return ModelConfig(base)


def vec(seed, dim=DIM):
    r = np.random.default_rng(seed)
    v = r.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def test_add_and_prototype_is_mean():
    mem = PrototypeMemory(DIM, cfg())
    vs = [vec(i) for i in range(3)]
    for i, v in enumerate(vs):
        mem.add_example(Example(f"t{i}", "a", v), "a")
    proto = mem.prototypes["a"]
    np.testing.assert_allclose(proto, np.mean(vs, axis=0), atol=1e-6)


def test_knn_scores_softmax_normalized():
    mem = PrototypeMemory(DIM, cfg())
    for label, seed in [("a", 1), ("b", 2), ("c", 3)]:
        mem.add_example(Example(f"x{seed}", label, vec(seed)), label)
    res = mem.get_nearest_prototypes(vec(1), k=3)
    assert len(res) == 3
    scores = [s for _, s in res]
    assert abs(sum(scores) - 1.0) < 1e-5
    assert res[0][0] == "a"  # exact match is nearest
    assert scores == sorted(scores, reverse=True)


def test_knn_k_clamped_to_num_classes():
    mem = PrototypeMemory(DIM, cfg())
    mem.add_example(Example("x", "only", vec(0)), "only")
    res = mem.get_nearest_prototypes(vec(5), k=10)
    assert len(res) == 1
    assert abs(res[0][1] - 1.0) < 1e-6


def test_empty_memory_returns_empty():
    mem = PrototypeMemory(DIM, cfg())
    assert mem.get_nearest_prototypes(vec(0), k=5) == []


def test_wrong_dim_raises():
    mem = PrototypeMemory(DIM, cfg())
    with pytest.raises(ValueError):
        mem.add_example(Example("x", "a", np.ones(DIM + 1, np.float32)), "a")
    with pytest.raises(ValueError):
        mem.add_example(Example("x", "a", None), "a")


def test_pruning_to_max_keeps_closest_to_mean():
    mem = PrototypeMemory(DIM, cfg(max_examples_per_class=5))
    base = vec(42)
    # 5 tight cluster members + outliers
    for i in range(5):
        v = base + 0.01 * vec(100 + i)
        mem.add_example(Example(f"near{i}", "a", (v / np.linalg.norm(v)).astype(np.float32)), "a")
    for i in range(4):
        mem.add_example(Example(f"far{i}", "a", vec(200 + i)), "a")
    assert len(mem.texts["a"]) == 5
    # the tight cluster should dominate the kept set
    kept_near = sum(1 for t in mem.texts["a"] if t.startswith("near"))
    assert kept_near >= 4


def test_clear():
    mem = PrototypeMemory(DIM, cfg())
    mem.add_example(Example("x", "a", vec(0)), "a")
    mem.clear()
    assert mem.get_stats()["num_classes"] == 0
    assert mem.get_stats()["total_examples"] == 0
    assert mem.get_nearest_prototypes(vec(0)) == []


def test_stats():
    mem = PrototypeMemory(DIM, cfg())
    for i in range(3):
        mem.add_example(Example(f"x{i}", "a", vec(i)), "a")
    mem.add_example(Example("y", "b", vec(9)), "b")
    stats = mem.get_stats()
    assert stats["num_classes"] == 2
    assert stats["examples_per_class"] == {"a": 3, "b": 1}
    assert stats["total_examples"] == 4
    assert stats["prototype_dimensions"] == DIM


def test_capacity_growth_preserves_data():
    mem = PrototypeMemory(DIM, cfg())
    mem.add_example(Example("x", "a", vec(0)), "a")
    proto_before = mem.prototypes["a"].copy()
    # force class-capacity growth past the first bucket (4)
    for i, label in enumerate(["b", "c", "d", "e", "f"]):
        mem.add_example(Example(f"t{i}", label, vec(10 + i)), label)
    assert mem.state.class_capacity >= 6
    np.testing.assert_allclose(mem.prototypes["a"], proto_before, atol=1e-6)


def test_batched_add_matches_sequential():
    m1 = PrototypeMemory(DIM, cfg())
    m2 = PrototypeMemory(DIM, cfg())
    vs = np.stack([vec(i) for i in range(6)])
    labels = ["a", "b", "a", "b", "a", "b"]
    for i in range(6):
        m1.add_example(Example(f"t{i}", labels[i], vs[i]), labels[i])
    m2.add_batch_host([f"t{i}" for i in range(6)], vs, labels)
    np.testing.assert_allclose(m1.prototypes["a"], m2.prototypes["a"], atol=1e-6)
    np.testing.assert_allclose(m1.prototypes["b"], m2.prototypes["b"], atol=1e-6)


def test_memory_growth_bounded_at_1000_examples():
    """Analog of the reference's 1000-example growth-bound test
    (test_memory.py:187-212): device buffer stays at its padded capacity."""
    mem = PrototypeMemory(DIM, cfg(max_examples_per_class=20, example_capacity_buckets=[8, 32]))
    r = np.random.default_rng(0)
    embs = r.standard_normal((200, DIM)).astype(np.float32)
    mem.add_batch_host([f"t{i}" for i in range(200)], embs, ["a"] * 200)
    assert len(mem.texts["a"]) == 20
    assert mem.state.example_capacity <= 28  # max + slack


def test_concurrent_add_example_threadsafe():
    """Reference analog (test_memory.py:226-256): 3 threads × 100 adds.
    The reference passes only by grace of the GIL; this memory serializes
    writers with an explicit lock, so counts and prototypes stay exact."""
    import threading

    mem = PrototypeMemory(DIM, cfg(max_examples_per_class=500,
                                   example_capacity_buckets=[32, 128, 512, 1024]))
    n_threads, per_thread = 3, 100

    def worker(t):
        r = np.random.default_rng(t)
        for i in range(per_thread):
            v = r.standard_normal(DIM).astype(np.float32)
            v /= np.linalg.norm(v)
            mem.add_example(Example(f"t{t}-{i}", f"class{t}", v), f"class{t}")

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    stats = mem.get_stats()
    assert stats["total_examples"] == n_threads * per_thread
    for t in range(n_threads):
        assert stats["examples_per_class"][f"class{t}"] == per_thread
    # device counts agree with host bookkeeping
    for t in range(n_threads):
        slot = mem.label_to_index[f"class{t}"]
        assert int(mem.state.count[slot]) == per_thread


def test_updates_since_rebuild_counter_resets():
    """Stats counter resets at prototype_update_frequency
    (reference test_memory.py:104-119); with no rebuild step the counter is
    bookkeeping parity only."""
    mem = PrototypeMemory(DIM, cfg(prototype_update_frequency=5))
    for i in range(4):
        mem.add_example(Example(f"t{i}", "a", vec(i)), "a")
    assert mem.get_stats()["updates_since_rebuild"] == 4
    mem.add_example(Example("t4", "a", vec(4)), "a")
    assert mem.get_stats()["updates_since_rebuild"] == 0


def test_strategic_prototypes_in_memory():
    """compute_strategic_prototypes + cosine ranking (reference
    memory.py:247-295; the reference's get_strategic_prototypes has a latent
    NameError — F never imported — fixed here)."""
    import jax
    import jax.numpy as jnp
    from adaptive_classifier_tpu.strategic import SeparableCostFunction

    mem = PrototypeMemory(DIM, cfg())
    for label, seed in [("a", 1), ("b", 2)]:
        for i in range(3):
            mem.add_example(Example(f"{label}{i}", label, vec(seed * 10 + i)), label)

    cost = SeparableCostFunction(np.full(DIM, 0.05, np.float32),
                                 np.full(DIM, 0.05, np.float32))

    def f(z):
        p1 = jax.nn.sigmoid(z[:, 0])
        return jnp.stack([1 - p1, p1], axis=-1)

    # without strategic prototypes: falls back to regular kNN
    res = mem.get_strategic_prototypes(vec(11), k=2)
    assert len(res) == 2

    mem.compute_strategic_prototypes(cost, f)
    assert set(mem.strategic_prototypes) == {"a", "b"}
    res = mem.get_strategic_prototypes(vec(11), k=2)
    assert len(res) == 2
    # cosine scores sorted descending
    assert res[0][1] >= res[1][1]
    assert all(-1.001 <= s <= 1.001 for _, s in res)


def test_min_similarity_filter():
    """get_nearest_prototypes(min_similarity=...) thresholds the RAW
    exp(−d²) similarity, not the post-softmax score (reference memory.py:85-96
    accepts the parameter but never applies it; we implement raw-similarity
    semantics — see docs/PARITY.md)."""
    mem = PrototypeMemory(DIM, cfg())
    for label, seed in [("a", 1), ("b", 2), ("c", 3)]:
        mem.add_example(Example(f"x{seed}", label, vec(seed)), label)
    all_res = mem.get_nearest_prototypes(vec(1), k=3)
    assert len(all_res) == 3
    # query == class-a prototype exactly → raw sim exp(0) = 1.0 for "a";
    # random unit vectors put every other class's raw sim well below 0.999
    filtered = mem.get_nearest_prototypes(vec(1), k=3, min_similarity=0.999)
    assert [lbl for lbl, _ in filtered] == ["a"]
    # threshold above 1.0 removes everything
    assert mem.get_nearest_prototypes(vec(1), k=3, min_similarity=1.5) == []


def test_zero_headroom_capacity_never_corrupts_alignment():
    """Regression: example_capacity_slack=0 with a bucket ceiling equal to
    max_examples_per_class used to make add_batch clip appends onto the
    last row, silently overwriting stored examples and desyncing
    text<->embedding pairs.  Now one slack row is always reserved."""
    from adaptive_classifier_tpu.config import ModelConfig
    from adaptive_classifier_tpu.memory import PrototypeMemory

    cfg = ModelConfig({"example_capacity_buckets": [4],
                       "max_examples_per_class": 4,
                       "example_capacity_slack": 0,
                       "class_capacity_buckets": [8]})
    mem = PrototypeMemory(8, config=cfg)
    rng = np.random.default_rng(0)
    vecs = {}
    for i in range(6):
        v = rng.standard_normal(8).astype(np.float32)
        v /= np.linalg.norm(v)
        vecs[f"t{i}"] = v
        mem.add_batch_host([f"t{i}"], v[None, :], ["a"])
    # every surviving text's stored row is ITS OWN embedding
    slot = mem.label_to_index["a"]
    texts = mem.texts["a"]
    assert 1 <= len(texts) <= 4
    emb = np.asarray(mem.state.emb[slot, :len(texts)])
    for row, t in zip(emb, texts):
        np.testing.assert_allclose(row, vecs[t], atol=1e-6, err_msg=t)
