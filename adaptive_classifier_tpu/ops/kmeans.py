"""K-means in JAX — Lloyd's iterations are pure matmul/argmin on the MXU.

Replaces the reference's sklearn ``KMeans(n_clusters=k, random_state=42,
n_init=10)`` used for representative-example selection (reference:
src/adaptive_classifier/classifier.py:1533-1571).  kmeans++ seeding and the
10 restarts are vmapped over seeds; the best-inertia run wins.  Deterministic
under a fixed PRNG key — matching the reference's *guarantee* (seeded,
reproducible selection), not sklearn's bit pattern.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _plusplus_init(key: jax.Array, x: jax.Array, valid: jax.Array, k: int) -> jax.Array:
    """kmeans++ seeding over valid rows — [k, D]."""
    n = x.shape[0]
    big = 1e30

    def pick(c, key, d2):
        p = jnp.where(valid, d2, 0.0)
        total = jnp.sum(p)
        p = jnp.where(total > 0, p / jnp.maximum(total, 1e-12),
                      valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1.0))
        idx = jax.random.choice(key, n, p=p)
        return x[idx]

    key0, key = jax.random.split(key)
    first = x[jax.random.choice(key0, n, p=valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1.0))]

    def body(i, carry):
        cents, d2, key = carry
        key, sub = jax.random.split(key)
        c = pick(i, sub, d2)
        cents = cents.at[i].set(c)
        dist_new = jnp.sum((x - c[None, :]) ** 2, axis=-1)
        d2 = jnp.minimum(d2, dist_new)
        return cents, d2, key

    cents = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)
    d2 = jnp.sum((x - first[None, :]) ** 2, axis=-1)
    cents, _, _ = jax.lax.fori_loop(1, k, body, (cents, d2, key))
    return cents


def _lloyd(x: jax.Array, valid: jax.Array, cents: jax.Array, iters: int) -> Tuple[jax.Array, jax.Array]:
    vmask = valid.astype(jnp.float32)

    def step(_, cents):
        d2 = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * x @ cents.T
            + jnp.sum(cents * cents, axis=1)[None, :]
        )
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, cents.shape[0]) * vmask[:, None]
        sums = onehot.T @ x
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cents)
        return new

    cents = jax.lax.fori_loop(0, iters, step, cents)
    d2 = (
        jnp.sum(x * x, axis=1, keepdims=True)
        - 2.0 * x @ cents.T
        + jnp.sum(cents * cents, axis=1)[None, :]
    )
    inertia = jnp.sum(jnp.min(d2, axis=1) * vmask)
    return cents, inertia


@functools.partial(jax.jit, static_argnames=("k", "n_init", "iters"))
def kmeans_fit(
    x: jax.Array,         # [N, D] float32 (padded)
    valid: jax.Array,     # [N] bool
    key: jax.Array,
    k: int,
    n_init: int = 10,
    iters: int = 50,
) -> jax.Array:
    """Best-of-n_init k-means centroids — [k, D]."""
    keys = jax.random.split(key, n_init)

    def one(seed_key):
        cents = _plusplus_init(seed_key, x, valid, k)
        return _lloyd(x, valid, cents, iters)

    all_cents, inertias = jax.vmap(one)(keys)
    best = jnp.argmin(inertias)
    return all_cents[best]


@functools.partial(jax.jit, static_argnames=("k",))
def representative_indices(
    x: jax.Array,       # [N, D] float32 (padded, L2-normalized rows)
    valid: jax.Array,   # [N] bool
    key: jax.Array,
    k: int,
) -> jax.Array:
    """Indices of the k examples nearest to the k-means centroids — [k].

    Matches the reference's selection procedure (classifier.py:1560-1571):
    fit k-means, then per centroid pick the closest example.
    """
    cents = kmeans_fit(x, valid, key, k)
    d = (
        jnp.sum(cents * cents, axis=1, keepdims=True)
        - 2.0 * cents @ x.T
        + jnp.sum(x * x, axis=1)[None, :]
    )  # [k, N]
    d = jnp.where(valid[None, :], d, jnp.inf)
    return jnp.argmin(d, axis=1)
