"""kNN kernel parity tests — the analog of the reference's backend-parity
tests (ONNX-vs-PyTorch cosine >0.99, reference tests/test_onnx_phase1.py:68-96):
Pallas kernel vs jnp reference vs numpy exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_classifier_tpu.ops import knn


def make_data(B=16, C=24, D=32, seed=0):
    """Unit-norm rows — the real domain (embeddings are L2-normalized, so
    d² ∈ [0, 4] and exp(−d²) never saturates)."""
    r = np.random.default_rng(seed)
    q = r.standard_normal((B, D)).astype(np.float32)
    p = r.standard_normal((C, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    valid = np.ones(C, bool)
    valid[C - 3 :] = False
    return jnp.asarray(q), jnp.asarray(p), jnp.asarray(valid)


def numpy_sims(q, p, valid):
    q, p, valid = np.asarray(q), np.asarray(p), np.asarray(valid)
    d2 = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    return np.where(valid[None, :], np.exp(-d2), 0.0)


def test_ref_impl_matches_numpy():
    q, p, valid = make_data()
    got = np.asarray(knn.masked_sims_ref(q, p, valid))
    np.testing.assert_allclose(got, numpy_sims(q, p, valid), rtol=1e-4, atol=1e-5)


def test_pallas_kernel_matches_ref_interpret():
    """Kernel parity via the Pallas interpreter (no TPU in CI)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, p, valid = make_data(B=128, C=128, D=128)
    ref = np.asarray(knn.masked_sims_ref(q, p, valid))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(knn.masked_sims_pallas(q, p, valid))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_topk_scores_exact_ranking():
    q, p, valid = make_data()
    sims = knn.masked_sims_ref(q, p, valid)
    scores, idx = knn.topk_scores(sims, valid, k=5)
    scores, idx = np.asarray(scores), np.asarray(idx)
    sims_np = numpy_sims(q, p, valid)
    for b in range(sims_np.shape[0]):
        expect = np.argsort(-np.where(np.asarray(valid), sims_np[b], -np.inf))[:5]
        assert set(idx[b]) == set(expect)
        # softmax over the selected k
        sel = sims_np[b][idx[b]]
        sm = np.exp(sel - sel.max())
        sm = sm / sm.sum()
        order = np.argsort(-sel)
        np.testing.assert_allclose(np.sort(scores[b])[::-1], sm[order], atol=1e-5)
        assert abs(scores[b].sum() - 1.0) < 1e-5


def test_topk_fewer_valid_than_k():
    q = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)).astype(np.float32))
    p = jnp.asarray(np.random.default_rng(1).standard_normal((6, 8)).astype(np.float32))
    valid = jnp.asarray([True, True, False, False, False, False])
    sims = knn.masked_sims_ref(q, p, valid)
    scores, idx = knn.topk_scores(sims, valid, k=5)
    scores, idx = np.asarray(scores), np.asarray(idx)
    assert (idx[:, 2:] == -1).all()
    assert np.allclose(scores.sum(axis=1), 1.0, atol=1e-5)
    assert (scores[:, 2:] == 0).all()


def test_full_scores_softmax_over_valid():
    q, p, valid = make_data()
    sims = knn.masked_sims_ref(q, p, valid)
    full = np.asarray(knn.full_scores(sims, valid))
    valid_np = np.asarray(valid)
    assert np.allclose(full.sum(axis=1), 1.0, atol=1e-5)
    assert (full[:, ~valid_np] == 0).all()
    # recall@all parity: ranking by full score == ranking by distance
    sims_np = numpy_sims(q, p, valid)
    for b in range(4):
        got = np.argmax(full[b])
        assert got == np.argmax(sims_np[b])


def test_dispatch_uses_ref_on_cpu():
    q, p, valid = make_data()
    got = np.asarray(knn.masked_sims(q, p, valid))
    np.testing.assert_allclose(got, numpy_sims(q, p, valid), rtol=1e-4, atol=1e-5)


def test_recall_at_10_parity_exact():
    """North-star check: exact kNN ⇒ recall@10 == brute force (FAISS-flat
    parity by construction, BASELINE.md)."""
    q, p, valid = make_data(B=32, C=64, D=48, seed=7)
    sims = knn.masked_sims_ref(q, p, valid)
    _, idx = knn.topk_scores(sims, valid, k=10)
    idx = np.asarray(idx)
    sims_np = numpy_sims(q, p, valid)
    for b in range(32):
        brute = set(np.argsort(-sims_np[b])[:10])
        assert set(idx[b]) == brute
