"""Continual learning after a LOSSY load — the post-checkpoint regime.

Checkpoints keep only ``num_representative_examples`` (5) rows per class
(reference classifier.py:559-566), so a loaded classifier's replay store is
a thin shadow of what trained it.  Round 3 found that this regime silently
destroyed loaded classifiers:

1. ANY ``add_examples`` recomputed EVERY prototype as the mean of the ~5
   surviving rows, discarding the exact checkpointed prototypes (measured on
   a real zoo checkpoint: one unrelated add drifted every class's prototype
   ~0.4 L2 and dropped prototype-only accuracy 0.70 → 0.43).  Fixed by
   running-mean prototypes carrying a persisted aggregate weight
   (``MemoryState.pweight``, restored from training_history).
2. Incremental new-class training over the thin replay catastrophically
   forgot the head (old-class per-label-fusion accuracy 0.70 → 0.00; EWC and
   LwF distillation up to λ=512 could not stop it).  Fixed by freezing the
   trunk + old output rows and fitting the new classes as one-vs-all sigmoid
   probes with a raw-embedding skip connection
   (``config.incremental_freeze_on_lossy_replay``).

The reference's own issue-#53 test only covers FRESH classifiers (full
replay), so these are new guarantees, not ports.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import synthetic_embed


def _embed(texts, dim=128):
    return synthetic_embed(texts, dim=dim, noise=0.05)


@pytest.fixture
def saved_loaded(tiny_classifier_factory, tmp_path):
    """Train 4 well-separated classes on 12 rows each, save, load.

    After the load the replay store is lossy: 5 representative rows/class
    vs training_history of 12."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = tiny_classifier_factory(embedding_cache_size=0)
    clf._get_embeddings = lambda t: _embed(t, dim=clf.embedding_dim)
    texts, labels = [], []
    for c in ["alpha", "beta", "gamma", "delta"]:
        for i in range(12):
            texts.append(f"{c}:example {i}")
            labels.append(c)
    clf.add_examples(texts, labels)
    clf.save(str(tmp_path / "ckpt"))

    loaded = AdaptiveClassifier.load(str(tmp_path / "ckpt"))
    loaded._get_embeddings = lambda t: _embed(t, dim=loaded.embedding_dim)
    return loaded


def test_loaded_prototypes_survive_unrelated_add(saved_loaded):
    """Adding to one class must not move any OTHER class's prototype, and
    the touched class folds in at the full training-history weight."""
    clf = saved_loaded
    n = len(clf.label_to_id)
    before = np.asarray(clf.memory.state.proto)[:n].copy()
    pw = np.asarray(clf.memory.state.pweight)[:n]
    assert pw.min() >= 12.0, "pweight must restore from training_history"

    clf.add_examples(["alpha:fresh row"], ["alpha"])
    after = np.asarray(clf.memory.state.proto)[:n]
    drift = np.linalg.norm(after - before, axis=1)
    a = clf.label_to_id["alpha"]
    untouched = [i for i in range(n) if i != a]
    assert np.all(drift[untouched] == 0.0), drift
    # running mean at weight 12: |Δ| = |x − p| / 13 — small but nonzero
    assert 0.0 < drift[a] < 0.25


def test_lossy_new_class_keeps_old_head_logits_bit_identical(saved_loaded):
    clf = saved_loaded
    n_old = len(clf.label_to_id)
    probe = _embed([f"{c}:probe" for c in
                    ["alpha", "beta", "gamma", "delta"]],
                   dim=clf.embedding_dim)
    logits_before = np.asarray(clf._head_logits(jnp.asarray(probe)))[:, :n_old]

    clf.add_examples(
        [f"omega:new {i}" for i in range(3)], ["omega"] * 3)
    logits_after = np.asarray(clf._head_logits(jnp.asarray(probe)))[:, :n_old]
    np.testing.assert_array_equal(logits_before, logits_after)


def test_lossy_new_class_preserves_old_predictions_and_learns_new(saved_loaded):
    clf = saved_loaded
    old_queries = [(f"{c}:query {i}", c)
                   for c in ["alpha", "beta", "gamma", "delta"]
                   for i in range(5)]
    base = clf.predict_batch([t for t, _ in old_queries], k=1)
    base_acc = sum(1 for (t, l), p in zip(old_queries, base)
                   if p and p[0][0] == l) / len(old_queries)
    assert base_acc == 1.0  # well-separated synthetic clusters

    clf.add_examples(
        [f"omega:new {i}" for i in range(3)], ["omega"] * 3)

    after = clf.predict_batch([t for t, _ in old_queries], k=1)
    acc = sum(1 for (t, l), p in zip(old_queries, after)
              if p and p[0][0] == l) / len(old_queries)
    assert acc == 1.0, "old-class predictions must survive a lossy-replay add"

    # the new class is predictable — per-label-weight rule (predict) AND
    # fixed-weight rule (predict_batch), on unseen same-cluster queries
    newq = [f"omega:query {i}" for i in range(4)]
    for preds in (clf.predict_batch(newq, k=1),
                  [clf.predict(t, k=1) for t in newq]):
        got = [p[0][0] for p in preds]
        assert got == ["omega"] * 4, got


def test_fresh_classifier_keeps_full_retrain_path(tiny_classifier_factory):
    """A never-saved classifier has full replay — the freeze path must NOT
    engage (the full retrain is what lifts old-class accuracy in the
    reference-protocol preservation eval)."""
    clf = tiny_classifier_factory(embedding_cache_size=0)
    clf._get_embeddings = lambda t: _embed(t, dim=clf.embedding_dim)
    texts, labels = [], []
    for c in ["alpha", "beta"]:
        for i in range(8):
            texts.append(f"{c}:example {i}")
            labels.append(c)
    clf.add_examples(texts, labels)
    before = clf.head_params
    clf.add_examples([f"omega:row {i}" for i in range(3)], ["omega"] * 3)
    # full retrain moves old output columns (no freezing)
    moved = np.abs(
        np.asarray(clf.head_params["out"]["w"][:, :2])
        - np.asarray(before["out"]["w"][:, :2])).max()
    assert moved > 0.0
    assert "skip" not in clf.head_params


def test_skip_probe_roundtrips_through_checkpoint(saved_loaded, tmp_path):
    """The raw-embedding skip probe written by the lossy path must survive
    save/load (written only when nonzero — reference interop intact)."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = saved_loaded
    clf.add_examples(
        [f"omega:new {i}" for i in range(3)], ["omega"] * 3)
    assert "skip" in clf.head_params
    newq = [f"omega:query {i}" for i in range(3)]
    want = [clf.predict(t, k=1)[0][0] for t in newq]

    clf.save(str(tmp_path / "ckpt2"))
    again = AdaptiveClassifier.load(str(tmp_path / "ckpt2"))
    again._get_embeddings = lambda t: _embed(t, dim=again.embedding_dim)
    assert "skip" in again.head_params
    got = [again.predict(t, k=1)[0][0] for t in newq]
    assert got == want
