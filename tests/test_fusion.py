"""Direct unit tests for the fusion ops (previously covered only through the
classifier) — hand-computed references for both fusion semantics."""

import jax.numpy as jnp
import numpy as np

from adaptive_classifier_tpu.ops import fusion, knn


def setup_case():
    r = np.random.default_rng(0)
    B, C = 3, 6
    protos = r.standard_normal((C, 16)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    q = r.standard_normal((B, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    valid = np.array([True, True, True, True, False, False])
    active = np.array([True, True, True, True, True, False])
    logits = r.standard_normal((B, C)).astype(np.float32)
    sims = np.asarray(knn.masked_sims_ref(jnp.asarray(q), jnp.asarray(protos),
                                          jnp.asarray(valid)))
    return sims, logits, valid, active


def softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def test_fuse_full_matches_reference_math():
    """fuse_full == the reference's _predict_regular combination
    (classifier.py:446-480) computed by hand."""
    sims, logits, valid, active = setup_case()
    B, C = sims.shape
    pw = np.linspace(0.3, 0.7, C).astype(np.float32)
    hw = (1.0 - pw).astype(np.float32)

    scores, ids = fusion.fuse_full(
        jnp.asarray(sims), jnp.asarray(logits), jnp.asarray(valid),
        jnp.asarray(active), jnp.asarray(pw), jnp.asarray(hw), 4, True,
    )
    scores, ids = np.asarray(scores), np.asarray(ids)

    for b in range(B):
        proto_scores = np.zeros(C)
        proto_scores[valid] = softmax(sims[b][valid])
        head_probs = np.zeros(C)
        head_probs[active] = softmax(logits[b][active])
        combined = proto_scores * pw + head_probs * hw
        combined = combined / combined.sum()
        order = np.argsort(-combined)[:4]
        np.testing.assert_array_equal(ids[b], order)
        np.testing.assert_allclose(scores[b], combined[order], atol=1e-5)


def test_fuse_topk_matches_reference_math():
    """fuse_topk == predict_batch's combination (classifier.py:1328-1384):
    top-k-restricted proto softmax + top-k head probs, fixed weights."""
    sims, logits, valid, active = setup_case()
    B, C = sims.shape
    k = 2

    scores, ids = fusion.fuse_topk(
        jnp.asarray(sims), jnp.asarray(logits), jnp.asarray(valid),
        jnp.asarray(active), 0.7, 0.3, k, True,
    )
    scores, ids = np.asarray(scores), np.asarray(ids)

    for b in range(B):
        # top-k prototypes by similarity, softmax over those k
        valid_idx = np.where(valid)[0]
        top_p = valid_idx[np.argsort(-sims[b][valid])][:k]
        proto_vec = np.zeros(C)
        proto_vec[top_p] = softmax(sims[b][top_p])
        # top-k head probabilities (softmax over active first)
        head_probs = np.zeros(C)
        head_probs[active] = softmax(logits[b][active])
        top_h = np.argsort(-head_probs)[:k]
        head_vec = np.zeros(C)
        head_vec[top_h] = head_probs[top_h]
        combined = 0.7 * proto_vec + 0.3 * head_vec
        combined = combined / combined.sum()
        order = np.argsort(-np.where(combined > 0, combined, -np.inf))[:k]
        np.testing.assert_array_equal(ids[b], order)
        np.testing.assert_allclose(scores[b], combined[order], atol=1e-5)


def test_fuse_full_without_head():
    sims, logits, valid, active = setup_case()
    scores, ids = fusion.fuse_full(
        jnp.asarray(sims), jnp.asarray(logits), jnp.asarray(valid),
        jnp.asarray(active), jnp.full(6, 0.7), jnp.full(6, 0.3), 3, False,
    )
    scores = np.asarray(scores)
    # top-3 slice of the 4-class normalized distribution: sums to < 1,
    # descending (reference returns predictions[:k] of the full distribution)
    assert (scores.sum(axis=1) < 1.0 + 1e-6).all()
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    # only prototype-valid classes can appear
    assert set(np.asarray(ids).ravel()) <= {0, 1, 2, 3}
