"""Strategic classification — vmapped game-theoretic best response.

TPU-native re-design of the reference strategic module (reference:
src/adaptive_classifier/strategic.py:1-358).  The reference's best-response
search is the hottest Python loop in the codebase: per sample, ~50 candidate
points are scored through ~50 separate forward passes
(strategic.py:88-101,225-238).  Here the candidate sweep is generated in one
shot and scored by a single batched forward — ``[B·K, D]`` through the head in
one MXU call — removing the loop entirely.

Candidate semantics match the reference exactly (strategic.py:104-123): the
original point, then per-feature ±2.0 sweeps (10 deltas per feature) truncated
to ``num_candidates``; Gaussian candidates only fill in when the sweep
under-produces (only possible for very low-dimensional inputs).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _as_vector(coeffs: Union[Dict[str, float], np.ndarray, jnp.ndarray, list],
               feature_names: Optional[List[str]], dim_hint: Optional[int] = None) -> jnp.ndarray:
    if isinstance(coeffs, dict):
        if feature_names is None:
            raise ValueError("feature_names required when using dict coefficients")
        return jnp.asarray([float(coeffs.get(n, 0.0)) for n in feature_names], jnp.float32)
    return jnp.asarray(np.asarray(coeffs, np.float32))


def _fit_dim(vec: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Broadcast/pad a coefficient vector to the embedding dimension.

    The reference lets cost vectors be defined over named features and dots
    them against full embeddings; for embedding-space use we pad with zeros
    (extra dims are free to move) or tile a scalar."""
    n = vec.shape[0]
    if n == dim:
        return vec
    if n == 1:
        return jnp.full((dim,), vec[0])
    if n < dim:
        return jnp.zeros((dim,), jnp.float32).at[:n].set(vec)
    return vec[:dim]


class StrategicCostFunction:
    """Base: cost of moving x → y, plus the batched best-response solver."""

    num_candidates: int = 50

    def compute_cost(self, x, y):  # pragma: no cover - abstract
        raise NotImplementedError

    def compute_cost_batch(self, x, cands):
        """cost(x_b, cand_bk) for [B, D] x and [B, K, D] candidates → [B, K]."""
        raise NotImplementedError

    # -- candidate sweep (reference strategic.py:104-123) ----------------
    def _generate_candidates(self, x: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        """[B, K, D] candidate points: x itself, then per-feature delta sweeps."""
        B, D = x.shape
        K = self.num_candidates
        deltas = jnp.linspace(-2.0, 2.0, 10)
        n_sweep = min(K - 1, D * 10)
        j = jnp.arange(n_sweep)
        feat = j // 10
        dval = deltas[j % 10]
        sweep = x[:, None, :] + (dval[:, None] * jax.nn.one_hot(feat, D))[None, :, :]
        cands = jnp.concatenate([x[:, None, :], sweep], axis=1)  # [B, 1+n_sweep, D]
        n_rand = K - 1 - n_sweep
        if n_rand > 0:
            if key is None:
                key = jax.random.PRNGKey(0)
            noise = jax.random.normal(key, (B, n_rand, D)) * 0.5
            cands = jnp.concatenate([cands, x[:, None, :] + noise], axis=1)
        return cands

    # -- best response ---------------------------------------------------
    def compute_best_response_batch(
        self,
        x: jax.Array,                     # [B, D]
        f: Callable[[jax.Array], jax.Array],  # [M, D] → [M, C] probabilities
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """argmax over candidates of ``max-prob(f(cand)) − cost(x, cand)``
        (reference strategic.py:74-102), one batched forward for all
        B × num_candidates points."""
        x = jnp.atleast_2d(x)
        B, D = x.shape
        cands = self._generate_candidates(x, key)             # [B, K, D]
        K = cands.shape[1]
        probs = f(cands.reshape(B * K, D))                    # [B*K, C]
        util_f = jnp.max(probs, axis=-1).reshape(B, K)
        cost = self.compute_cost_batch(x, cands)              # [B, K]
        utility = util_f - cost
        best = jnp.argmax(utility, axis=1)                    # [B]
        return jnp.take_along_axis(cands, best[:, None, None], axis=1)[:, 0, :]

    def compute_best_response(self, x, f, key=None):
        """Single-sample wrapper (reference API)."""
        x = jnp.asarray(x, jnp.float32)
        return self.compute_best_response_batch(x[None, :], f, key)[0]

    def compute_best_response_chunked(
        self,
        x: jax.Array,                     # [B, D]
        f: Callable[[jax.Array], jax.Array],
        key: Optional[jax.Array] = None,
        chunk: int = 256,
    ) -> jax.Array:
        """``compute_best_response_batch`` in row chunks.

        The candidate tensor is ``[B, K, D]`` — at production dims
        (D = 33k composed, K = 50) an unchunked sweep over a 1k-row
        replay store would transiently allocate tens of GB; chunking
        bounds it at ``chunk·K·D`` while producing identical rows (the
        sweep is deterministic; the Gaussian filler only exists for
        D < K/10, where chunking is unnecessary anyway)."""
        B = x.shape[0]
        if B <= chunk:
            return self.compute_best_response_batch(x, f, key)
        parts = []
        for s in range(0, B, chunk):
            sub = None if key is None else jax.random.fold_in(key, s)
            parts.append(self.compute_best_response_batch(x[s:s + chunk], f, sub))
        return jnp.concatenate(parts, axis=0)


class SeparableCostFunction(StrategicCostFunction):
    """c(x, y) = max{0, c2·y − c1·x} (reference strategic.py:41-123)."""

    def __init__(self, c1_coefficients, c2_coefficients, feature_names=None):
        if isinstance(c1_coefficients, dict) and feature_names is None:
            raise ValueError("feature_names required when using dict coefficients")
        self.c1 = _as_vector(c1_coefficients, feature_names)
        self.c2 = _as_vector(c2_coefficients, feature_names)
        self.feature_names = feature_names

    def compute_cost(self, x, y):
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        c1 = _fit_dim(self.c1, x.shape[-1])
        c2 = _fit_dim(self.c2, y.shape[-1])
        return jnp.maximum(jnp.dot(c2, y) - jnp.dot(c1, x), 0.0)

    def compute_cost_batch(self, x, cands):
        c1 = _fit_dim(self.c1, x.shape[-1])
        c2 = _fit_dim(self.c2, x.shape[-1])
        c1x = x @ c1                                   # [B]
        c2y = jnp.einsum("bkd,d->bk", cands, c2)       # [B, K]
        return jnp.maximum(c2y - c1x[:, None], 0.0)


class LinearCostFunction(SeparableCostFunction):
    """c(x, y) = ⟨α, y − x⟩₊ (reference strategic.py:126-155)."""

    def __init__(self, alpha, feature_names=None):
        if isinstance(alpha, dict) and feature_names is None:
            raise ValueError("feature_names required when using dict coefficients")
        vec = _as_vector(alpha, feature_names)
        super().__init__(vec, vec, feature_names)
        self.alpha = vec

    def compute_cost(self, x, y):
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        a = _fit_dim(self.alpha, x.shape[-1])
        return jnp.maximum(jnp.dot(a, y - x), 0.0)


class CostFunctionFactory:
    """Reference strategic.py:158-186."""

    @staticmethod
    def create_cost_function(cost_type: str, cost_coefficients, feature_names=None, **kwargs):
        # dict coefficients without explicit feature names use the dict's own
        # keys — the reference's README-style config
        # ({'sentiment_words': 0.5, ...}) would otherwise raise inside the
        # classifier's init and silently disable strategic mode
        if isinstance(cost_coefficients, dict) and feature_names is None:
            feature_names = list(cost_coefficients.keys())
        if cost_type == "linear":
            return LinearCostFunction(cost_coefficients, feature_names)
        if cost_type == "separable":
            c2 = kwargs.get("c2_coefficients", cost_coefficients)
            return SeparableCostFunction(cost_coefficients, c2, feature_names)
        raise ValueError(f"Unknown cost function type: {cost_type}")


class StrategicOptimizer:
    """Strategic training loss (reference strategic.py:189-242), vectorized."""

    def __init__(self, cost_function: StrategicCostFunction):
        self.cost_function = cost_function

    def strategic_loss_terms(
        self,
        forward: Callable[[jax.Array], jax.Array],  # [M, D] → masked logits [M, C]
        embeddings: jax.Array,                      # [B, D]
        labels: jax.Array,                          # [B]
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """(regular CE, strategic penalty) — combined as CE + λ·penalty.

        The penalty is CE on best-response points whose argmax flipped away
        from the true label, averaged over the batch (strategic.py:222-242).
        The best-response selection is non-differentiable (argmax over a
        fixed candidate sweep), matching the reference where candidates are
        scored under ``no_grad``; gradients flow through the forward on the
        selected points only.
        """
        logits = forward(embeddings)
        logp = jax.nn.log_softmax(logits, axis=-1)
        regular = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

        def f_probs(z):
            return jax.nn.softmax(forward(z), axis=-1)

        br = self.cost_function.compute_best_response_batch(
            jax.lax.stop_gradient(embeddings), lambda z: jax.lax.stop_gradient(f_probs(z)), key
        )
        br = jax.lax.stop_gradient(br)
        s_logits = forward(br)
        s_pred = jnp.argmax(s_logits, axis=-1)
        s_logp = jax.nn.log_softmax(s_logits, axis=-1)
        s_ce = -jnp.take_along_axis(s_logp, labels[:, None], axis=-1)[:, 0]
        flipped = (s_pred != labels).astype(jnp.float32)
        penalty = jnp.sum(s_ce * flipped) / jnp.maximum(embeddings.shape[0], 1)
        return regular, penalty

    def strategic_loss(self, forward, embeddings, labels, strategic_lambda=0.1, key=None):
        regular, penalty = self.strategic_loss_terms(forward, embeddings, labels, key)
        return regular + strategic_lambda * penalty


class StrategicEvaluator:
    """Robustness evaluation under simulated gaming (strategic.py:273-358)."""

    def __init__(self, cost_function: StrategicCostFunction):
        self.cost_function = cost_function

    def evaluate_robustness(
        self,
        forward: Callable[[jax.Array], jax.Array],   # [M, D] → logits [M, C]
        test_embeddings: jax.Array,
        test_labels: jax.Array,
        gaming_levels: List[float] = [0.0, 0.5, 1.0],
        key: Optional[jax.Array] = None,
    ) -> Dict[str, float]:
        key = key if key is not None else jax.random.PRNGKey(42)
        test_embeddings = jnp.asarray(test_embeddings)
        test_labels = jnp.asarray(test_labels)

        def f_probs(z):
            return jax.nn.softmax(forward(z), axis=-1)

        results: Dict[str, float] = {}
        for level in gaming_levels:
            key, gkey, bkey = jax.random.split(key, 3)
            games = jax.random.uniform(gkey, (test_embeddings.shape[0],)) < level
            br = self.cost_function.compute_best_response_batch(test_embeddings, f_probs, bkey)
            gamed = jnp.where(games[:, None], br, test_embeddings)
            preds = jnp.argmax(forward(gamed), axis=-1)
            acc = float(jnp.mean((preds == test_labels).astype(jnp.float32)))
            results[f"accuracy_gaming_{level}"] = acc

        a0 = results.get("accuracy_gaming_0.0", 0.0)
        a1 = results.get("accuracy_gaming_1.0", 0.0)
        results["robustness_score"] = a0 - a1
        results["relative_robustness"] = a1 / a0 if a0 > 0 else 0.0
        return results
