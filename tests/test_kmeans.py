"""K-means ops tests (sklearn-KMeans replacement, ops/kmeans.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_classifier_tpu.ops.kmeans import kmeans_fit, representative_indices


def clustered_data(n_per=20, k=3, dim=8, seed=0, n_cap=64):
    r = np.random.default_rng(seed)
    centers = r.standard_normal((k, dim)).astype(np.float32) * 5
    x = np.concatenate([
        centers[i] + 0.1 * r.standard_normal((n_per, dim)).astype(np.float32)
        for i in range(k)
    ])
    pad = np.zeros((n_cap, dim), np.float32)
    pad[: len(x)] = x
    valid = np.zeros(n_cap, bool)
    valid[: len(x)] = True
    return jnp.asarray(pad), jnp.asarray(valid), centers, x


def test_kmeans_finds_cluster_centers():
    x, valid, centers, _ = clustered_data()
    got = np.asarray(kmeans_fit(x, valid, jax.random.PRNGKey(0), k=3))
    # each true center has a found centroid within the cluster radius
    for c in centers:
        d = np.linalg.norm(got - c, axis=1).min()
        assert d < 0.5, d


def test_kmeans_deterministic():
    x, valid, *_ = clustered_data()
    a = np.asarray(kmeans_fit(x, valid, jax.random.PRNGKey(7), k=3))
    b = np.asarray(kmeans_fit(x, valid, jax.random.PRNGKey(7), k=3))
    np.testing.assert_array_equal(a, b)


def test_representative_indices_one_per_cluster():
    x, valid, centers, raw = clustered_data(n_per=10)
    idx = np.asarray(representative_indices(x, valid, jax.random.PRNGKey(0), k=3))
    assert len(idx) == 3
    assert all(0 <= i < 30 for i in idx)  # only valid rows selected
    # the three representatives come from three different true clusters
    clusters = set(int(i) // 10 for i in idx)
    assert len(clusters) == 3


def test_representatives_ignore_padding():
    x, valid, *_ = clustered_data()
    poisoned = np.asarray(x).copy()
    poisoned[~np.asarray(valid)] = 1e3
    idx = np.asarray(representative_indices(jnp.asarray(poisoned), valid,
                                            jax.random.PRNGKey(0), k=3))
    assert all(np.asarray(valid)[i] for i in idx)
