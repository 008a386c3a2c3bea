"""Two-stage fused top-k kNN kernel parity vs the materialized reference
path (ops/knn.masked_sims + topk_scores) — the analog of the reference's
FAISS-recall checks (reference tests/test_memory.py search assertions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptive_classifier_tpu.ops import knn
from adaptive_classifier_tpu.ops import knn_topk


def _ref(q, p, valid, k):
    sims = knn.masked_sims_ref(jnp.asarray(q), jnp.asarray(p), jnp.asarray(valid))
    return knn.topk_scores(sims, jnp.asarray(valid), k)


def _fused_interp(q, p, valid, k, **kw):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return knn_topk.topk_scores_fused(
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(valid), k, **kw
        )


def test_fused_matches_reference_small():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(16, 32)).astype(np.float32)
    p = rng.normal(size=(640, 32)).astype(np.float32)
    valid = np.ones(640, bool)
    s_ref, i_ref = _ref(q, p, valid, 5)
    s_got, i_got = _fused_interp(q, p, valid, 5, tile_c=256)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), atol=1e-6)


def test_fused_multi_tile_merge():
    """Winners spread across prototype tiles must survive the merge."""
    rng = np.random.default_rng(1)
    D = 16
    q = rng.normal(size=(4, D)).astype(np.float32)
    p = rng.normal(scale=10.0, size=(1024, D)).astype(np.float32)
    # plant near-duplicates of each query in DIFFERENT 256-wide tiles
    for b in range(4):
        for t, c in enumerate([3 + b, 300 + b, 600 + b, 900 + b]):
            p[c] = q[b] + 1e-3 * t
    valid = np.ones(1024, bool)
    s_ref, i_ref = _ref(q, p, valid, 4)
    s_got, i_got = _fused_interp(q, p, valid, 4, tile_c=256)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), atol=1e-6)


def test_fused_respects_validity_mask():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(8, 24)).astype(np.float32)
    p = rng.normal(size=(512, 24)).astype(np.float32)
    valid = np.zeros(512, bool)
    valid[:7] = True  # fewer valid than C; k > n_valid in one case below
    s_ref, i_ref = _ref(q, p, valid, 5)
    s_got, i_got = _fused_interp(q, p, valid, 5, tile_c=256)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), atol=1e-6)
    assert set(np.asarray(i_got).ravel()) <= set(range(7))


def test_fused_pads_k_past_valid_count():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    p = rng.normal(size=(256, 16)).astype(np.float32)
    valid = np.zeros(256, bool)
    valid[:3] = True
    s_got, i_got = _fused_interp(q, p, valid, 8)
    i_got = np.asarray(i_got)
    s_got = np.asarray(s_got)
    assert (i_got[:, 3:] == -1).all()
    assert (s_got[:, 3:] == 0.0).all()
    np.testing.assert_allclose(s_got.sum(axis=1), 1.0, atol=1e-6)


def test_fused_no_valid_prototypes_nan_free():
    q = np.ones((4, 16), np.float32)
    p = np.ones((256, 16), np.float32)
    valid = np.zeros(256, bool)
    s_got, i_got = _fused_interp(q, p, valid, 5)
    assert not np.isnan(np.asarray(s_got)).any()
    assert (np.asarray(i_got) == -1).all()


def test_fused_ragged_shapes_pad_correctly():
    """B, C, D not multiples of the tile sizes."""
    rng = np.random.default_rng(4)
    q = rng.normal(size=(13, 50)).astype(np.float32)
    p = rng.normal(size=(700, 50)).astype(np.float32)
    valid = np.ones(700, bool)
    s_ref, i_ref = _ref(q, p, valid, 7)
    s_got, i_got = _fused_interp(q, p, valid, 7, tile_c=256)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), atol=1e-6)


def test_auto_dispatch_below_threshold_uses_reference():
    """On CPU / small C the dispatcher must route to the materialized path."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    valid = jnp.ones(64, bool)
    s_ref, i_ref = _ref(q, p, valid, 3)
    s_got, i_got = knn_topk.topk_scores_auto(q, p, valid, 3)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), atol=1e-6)


def test_fused_rejects_oversized_k():
    q = jnp.ones((4, 16))
    p = jnp.ones((256, 16))
    with pytest.raises(ValueError):
        knn_topk.topk_scores_fused(q, p, jnp.ones(256, bool), 129)


def test_fused_bias_matches_materialized():
    """Pre-selection bias (post-incremental recalibration): the fused
    kernel's biased selection + scores must equal knn.topk_scores(bias=...),
    and the raw similarities must stay bias-FREE (min_similarity scale)."""
    rng = np.random.default_rng(9)
    q = rng.normal(size=(8, 24)).astype(np.float32)
    p = rng.normal(size=(512, 24)).astype(np.float32)
    valid = np.ones(512, bool)
    bias = np.zeros(512, np.float32)
    bias[::3] = -0.25            # penalize a third of the classes
    sims = knn.masked_sims_ref(jnp.asarray(q), jnp.asarray(p),
                               jnp.asarray(valid))
    s_ref, i_ref = knn.topk_scores(sims, jnp.asarray(valid), 5,
                                   bias=jnp.asarray(bias))
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        s_got, i_got, raw = knn_topk.topk_scores_fused(
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(valid), 5,
            tile_c=256, bias=jnp.asarray(bias), return_raw=True)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref),
                               atol=1e-6)
    # bias must change the selection vs the unbiased kernel somewhere
    _, i_plain = _ref(q, p, valid, 5)
    assert not np.array_equal(np.asarray(i_got), np.asarray(i_plain))
    # raw = unbiased exp(−d²) of the selected neighbors
    expect_raw = np.take_along_axis(np.asarray(sims),
                                    np.asarray(i_got), axis=1)
    np.testing.assert_allclose(np.asarray(raw), expect_raw, atol=1e-6)


def test_fuse_topk_from_emb_fused_path_parity():
    """predict_batch's fused large-C route (fused_min_classes) must produce
    the same fusion output as the materialized route, bias included."""
    from jax.experimental.pallas import tpu as pltpu

    from adaptive_classifier_tpu.ops import fusion

    rng = np.random.default_rng(10)
    B, C, D = 8, 512, 32
    emb = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    proto = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    valid = jnp.ones(C, bool)
    active = jnp.ones(C, bool)
    bias = jnp.asarray((rng.random(C) < 0.3).astype(np.float32) * -0.2)

    base_s, base_i = fusion.fuse_topk_from_emb(
        emb, proto, valid, None, active, 0.7, 0.3, 5, False,
        proto_bias=bias)
    before = knn_topk.FUSED_DISPATCHES
    knn_topk.FORCE_FUSED = True
    try:
        with pltpu.force_tpu_interpret_mode():
            fused_s, fused_i = fusion.fuse_topk_from_emb(
                emb, proto, valid, None, active, 0.7, 0.3, 5, False,
                proto_bias=bias, fused_min_classes=C)
    finally:
        knn_topk.FORCE_FUSED = False
    assert knn_topk.FUSED_DISPATCHES > before  # kernel route really taken
    np.testing.assert_allclose(np.asarray(fused_s), np.asarray(base_s),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fused_i), np.asarray(base_i))
