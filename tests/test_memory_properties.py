"""Property-based tests for the memory state machine (hypothesis).

The padded-buffer state machine (append / prune / recompute) must uphold its
invariants for arbitrary interleavings of adds across classes — the kind of
coverage example-based tests miss (docs/ROADMAP.md quality item).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from adaptive_classifier_tpu import Example, ModelConfig, PrototypeMemory

DIM = 8
MAX_EX = 6


def make_memory():
    return PrototypeMemory(DIM, ModelConfig({
        "class_capacity_buckets": [4, 8],
        "example_capacity_buckets": [8, 16],
        "max_examples_per_class": MAX_EX,
        "example_capacity_slack": 4,
    }))


adds = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 10**6)),  # (class idx, vec seed)
    min_size=1, max_size=40,
)


def vec(seed):
    r = np.random.default_rng(seed)
    v = r.standard_normal(DIM).astype(np.float32)
    return v / np.linalg.norm(v)


@settings(max_examples=25, deadline=None)
@given(adds)
def test_invariants_hold_for_any_add_sequence(seq):
    mem = make_memory()
    expected: dict = {}
    for cls_i, seed in seq:
        label = f"c{cls_i}"
        mem.add_example(Example(f"t{seed}", label, vec(seed)), label)
        expected.setdefault(label, 0)
        expected[label] = min(expected[label] + 1, MAX_EX)

    stats = mem.get_stats()
    # 1. counts never exceed the cap and match the host expectation
    assert stats["examples_per_class"] == expected
    # 2. device counts agree with host text lists
    for label, slot in mem.label_to_index.items():
        assert int(mem.state.count[slot]) == len(mem.texts[label])
    # 3. prototypes are exactly the masked means of the stored rows
    emb = np.asarray(mem.state.emb)
    proto = np.asarray(mem.state.proto)
    for label, slot in mem.label_to_index.items():
        n = int(mem.state.count[slot])
        if n:
            np.testing.assert_allclose(proto[slot], emb[slot, :n].mean(0),
                                       atol=1e-5)
    # 4. rows beyond count are zero (no stale data leaks into means)
    for label, slot in mem.label_to_index.items():
        n = int(mem.state.count[slot])
        assert np.abs(emb[slot, n:]).max() == 0.0 if emb.shape[1] > n else True
    # 5. kNN scores remain a distribution
    res = mem.get_nearest_prototypes(vec(1), k=5)
    if res:
        assert abs(sum(s for _, s in res) - 1.0) < 1e-4


@settings(max_examples=15, deadline=None)
@given(adds, st.integers(0, 4))
def test_clear_class_then_continue(seq, clear_cls):
    mem = make_memory()
    for cls_i, seed in seq:
        label = f"c{cls_i}"
        mem.add_example(Example(f"t{seed}", label, vec(seed)), label)
    mem.remove_label(f"c{clear_cls}")
    assert mem.get_stats()["examples_per_class"].get(f"c{clear_cls}") is None
    # adding after removal works and rebuilds the prototype
    mem.add_example(Example("new", f"c{clear_cls}", vec(999)), f"c{clear_cls}")
    assert mem.get_stats()["examples_per_class"][f"c{clear_cls}"] == 1
