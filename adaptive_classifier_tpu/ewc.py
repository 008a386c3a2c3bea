"""Elastic Weight Consolidation — Fisher information as a jitted scan.

TPU-native re-design of the reference EWC (reference:
src/adaptive_classifier/ewc.py:7-115).  The reference loops a DataLoader and
calls ``.backward()`` per batch; here the whole Fisher estimate is one jitted
``fori_loop``: per batch, sample labels from the model's own softmax
(ewc.py:77-84), take the gradient of the mean NLL, and accumulate
``grad²/num_batches`` (ewc.py:90-92).  The quadratic penalty itself lives in
``training.ewc_penalty``.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .models.head import head_forward, NEG_INF

BATCH_SIZE = 32


class EWCBundle(NamedTuple):
    """Snapshot of old parameters + their Fisher information + strength."""
    old_params: Any
    fisher: Any
    ewc_lambda: float


@functools.partial(jax.jit, static_argnames=())
def compute_fisher(
    params,
    emb: jax.Array,        # [N_cap, D]
    valid: jax.Array,      # [N_cap] bool
    active: jax.Array,     # [C_cap] bool — classes the old model knew
    rng: jax.Array,
):
    """Fisher = mean over batches of (batch-mean NLL grad)², labels sampled
    from the model's own output distribution (ewc.py:66-94)."""
    N = emb.shape[0]
    vmask_f = valid.astype(jnp.float32)
    n_real = jnp.sum(valid.astype(jnp.int32))
    n_batches = jnp.maximum((n_real + BATCH_SIZE - 1) // BATCH_SIZE, 1)

    rng, prng = jax.random.split(rng)
    u = jax.random.uniform(prng, (N,))
    perm = jnp.argsort(jnp.where(valid, u, 2.0 + u))

    def batch_step(b, carry):
        fisher, rng_ = carry
        rng_, srng = jax.random.split(rng_)
        idx = jax.lax.dynamic_slice_in_dim(perm, b * BATCH_SIZE, BATCH_SIZE)
        x = emb[idx]
        v = vmask_f[idx]

        # eval-mode forward (no dropout) to sample labels — model.eval() in
        # the reference (ewc.py:57)
        logits = head_forward(params, x, train=False)
        logits = jnp.where(active[None, :], logits, NEG_INF)
        sampled = jax.random.categorical(srng, logits, axis=-1)

        def nll(p):
            lg = head_forward(p, x, train=False)
            lg = jnp.where(active[None, :], lg, NEG_INF)
            logp = jax.nn.log_softmax(lg, axis=-1)
            per = -jnp.take_along_axis(logp, sampled[:, None], axis=-1)[:, 0]
            return jnp.sum(per * v) / jnp.maximum(jnp.sum(v), 1.0)

        grads = jax.grad(nll)(params)
        fisher = jax.tree.map(
            lambda f, g: f + g * g / n_batches.astype(jnp.float32),
            fisher, grads,
        )
        return fisher, rng_

    fisher0 = jax.tree.map(jnp.zeros_like, params)
    fisher, _ = jax.lax.fori_loop(0, n_batches, batch_step, (fisher0, rng))
    return fisher


def make_ewc_bundle(old_params, emb, valid, active, rng, ewc_lambda: float) -> EWCBundle:
    fisher = compute_fisher(old_params, emb, valid, active, rng)
    return EWCBundle(old_params=old_params, fisher=fisher, ewc_lambda=ewc_lambda)


class EWC:
    """Object facade — API parity with the reference class (ewc.py:7-115).

    ``EWC(params, embeddings, ...)`` snapshots the parameters and computes
    Fisher information from them; ``ewc_loss(current_params, batch_size)``
    returns ``λ·Σ F·(θ−θ_old)² / batch_size`` for the parameters being
    trained.  (The reference's signature takes a live ``nn.Module`` whose
    drifting parameters are read at loss time; pass the current params
    explicitly here — pure functions, no hidden mutation.)
    """

    def __init__(self, params, embeddings, active=None,
                 ewc_lambda: float = 100.0, key: Optional[jax.Array] = None):
        import numpy as np

        emb = jnp.asarray(np.asarray(embeddings, np.float32))
        n = emb.shape[0]
        n_cap = max(BATCH_SIZE, ((n + BATCH_SIZE - 1) // BATCH_SIZE) * BATCH_SIZE)
        padded = jnp.zeros((n_cap, emb.shape[1]), jnp.float32).at[:n].set(emb)
        valid = jnp.arange(n_cap) < n
        if active is None:
            active = jnp.ones((params["out"]["w"].shape[1],), bool)
        self.ewc_lambda = ewc_lambda
        self.old_params = params
        self.fisher = compute_fisher(
            params, padded, valid, jnp.asarray(active),
            key if key is not None else jax.random.PRNGKey(42),
        )

    def ewc_loss(self, current_params=None, batch_size: Optional[int] = None) -> jax.Array:
        from .training import ewc_penalty

        params = current_params if current_params is not None else self.old_params
        bn = jnp.asarray(float(batch_size)) if batch_size is not None else jnp.asarray(1.0)
        return ewc_penalty(params, self.old_params, self.fisher, self.ewc_lambda, bn)

    @property
    def bundle(self) -> EWCBundle:
        return EWCBundle(self.old_params, self.fisher, self.ewc_lambda)
