"""Head training — whole training runs as single jitted device programs.

TPU-native re-design of the reference's replay-based training loops
(reference: src/adaptive_classifier/classifier.py:1428-1522 regular,
:202-367 incremental-new-class, multilabel.py:309-413 BCE).  The reference
re-trains the head from scratch over all stored embeddings on every
``add_examples`` call; that replay structure is TPU-friendly: the entire
multi-epoch loop — shuffling, batching, AdamW, gradient clipping, plateau LR
decay, early stopping — compiles to one XLA program via ``lax.while_loop`` /
``fori_loop``, with zero host round-trips until the final parameters come back.

Semantics preserved:
- AdamW(lr=1e-3, weight_decay=0.01, betas=(0.9, 0.999)), global-norm grad
  clip 1.0 (classifier.py:1464-1505);
- ReduceLROnPlateau(factor=0.5, patience=2, rel threshold 1e-4)
  (classifier.py:1472-1477);
- early stopping patience 3 on average epoch loss (classifier.py:1479-1520);
- EWC penalty ``λ·Σ F·(θ−θ_old)²`` normalized by batch size (ewc.py:96-115);
- dropout active during training (models.py:58).

Fixed shapes: example counts are bucketed; real rows are marked by a validity
mask and each epoch's shuffle sorts valid rows to the front, so the batch
structure (⌈N/32⌉ batches, partial final batch) matches the reference's
DataLoader exactly.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .models.head import head_forward, NEG_INF

BATCH_SIZE = 32


# ---------------------------------------------------------------------------
# AdamW (hand-rolled so the LR can live in the loop carry)
# ---------------------------------------------------------------------------

class AdamW(NamedTuple):
    m: Any
    v: Any
    step: jax.Array


def adamw_init(params) -> AdamW:
    return AdamW(
        m=jax.tree.map(jnp.zeros_like, params),
        v=jax.tree.map(jnp.zeros_like, params),
        step=jnp.zeros((), jnp.int32),
    )


def adamw_update(params, grads, opt: AdamW, lr, weight_decay=0.01,
                 b1=0.9, b2=0.999, eps=1e-8):
    step = opt.step + 1
    t = step.astype(jnp.float32)
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, opt.m, grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, opt.v, grads)
    bc1 = 1 - b1 ** t
    bc2 = 1 - b2 ** t
    new_params = jax.tree.map(
        lambda p, m_, v_: p - lr * (m_ / bc1 / (jnp.sqrt(v_ / bc2) + eps) + weight_decay * p),
        params, m, v,
    )
    return new_params, AdamW(m=m, v=v, step=step)


def clip_global_norm(grads, max_norm=1.0):
    norm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def _ce_loss(params, x, y, vmask, active, rng):
    """Masked cross-entropy over active class slots; mean over valid rows."""
    logits = head_forward(params, x, dropout_rng=rng, train=True)
    logits = jnp.where(active[None, :], logits, NEG_INF)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.clip(y, 0)[:, None], axis=-1)[:, 0]
    n = jnp.maximum(jnp.sum(vmask), 1.0)
    return jnp.sum(nll * vmask) / n


def _bce_loss(params, x, y_multihot, vmask, active, rng):
    """Sigmoid BCE over active class slots; elementwise mean over valid rows ×
    active columns (multilabel.py:370,388-390 uses nn.BCELoss)."""
    logits = head_forward(params, x, dropout_rng=rng, train=True)
    p = jnp.clip(jax.nn.sigmoid(logits), 1e-7, 1 - 1e-7)
    bce = -(y_multihot * jnp.log(p) + (1 - y_multihot) * jnp.log(1 - p))
    elems = bce * active[None, :].astype(jnp.float32) * vmask[:, None]
    denom = jnp.maximum(jnp.sum(vmask) * jnp.sum(active), 1.0)
    return jnp.sum(elems) / denom


def ewc_penalty(params, ewc_old, ewc_fisher, ewc_lambda, batch_n):
    """λ·Σ F·(θ−θ_old)² / batch_size (reference ewc.py:96-115)."""
    sq = sum(
        jnp.sum(f * (p - o) ** 2)
        for f, p, o in zip(jax.tree.leaves(ewc_fisher), jax.tree.leaves(params),
                           jax.tree.leaves(ewc_old))
    )
    return ewc_lambda * sq / jnp.maximum(batch_n, 1.0)


# ---------------------------------------------------------------------------
# the fused training program
# ---------------------------------------------------------------------------

class TrainResult(NamedTuple):
    params: Any
    final_loss: jax.Array
    epochs_run: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("loss_type", "max_epochs", "patience", "use_scheduler", "has_ewc"),
)
def fit_head(
    params,
    emb: jax.Array,          # [N_cap, D] float32
    labels: jax.Array,       # [N_cap] int32 (ce) or [N_cap, C_cap] float32 (bce)
    valid: jax.Array,        # [N_cap] bool — real rows
    active: jax.Array,       # [C_cap] bool — active class slots
    rng: jax.Array,
    lr: float = 1e-3,
    loss_type: str = "ce",
    max_epochs: int = 10,
    patience: int = 3,
    use_scheduler: bool = True,
    has_ewc: bool = False,
    ewc_old=None,
    ewc_fisher=None,
    ewc_lambda: float = 0.0,
) -> TrainResult:
    """One fused device program: the full multi-epoch training loop."""
    N = emb.shape[0]
    vmask_f = valid.astype(jnp.float32)
    n_real = jnp.sum(valid.astype(jnp.int32))
    # traced batch count: fori_loop lowers to while_loop, so padding batches
    # beyond ⌈N_real/32⌉ cost nothing even when the capacity bucket is large
    n_batches = jnp.maximum((n_real + BATCH_SIZE - 1) // BATCH_SIZE, 1)

    loss_fn = _ce_loss if loss_type == "ce" else _bce_loss

    def epoch_body(state):
        (params, opt, epoch, rng, best, pc, sched_best, sc, lr_scale, last, stop) = state
        rng, prng, brng = jax.random.split(jax.random.fold_in(rng, epoch), 3)
        # shuffle valid rows to the front so batches mirror the DataLoader's
        u = jax.random.uniform(prng, (N,))
        perm = jnp.argsort(jnp.where(valid, u, 2.0 + u))

        def batch_step(b, carry):
            params, opt, loss_sum, rng_ = carry
            rng_, drng = jax.random.split(rng_)
            idx = jax.lax.dynamic_slice_in_dim(perm, b * BATCH_SIZE, BATCH_SIZE)

            def total_loss(p):
                x = emb[idx]
                y = labels[idx]
                v = vmask_f[idx]
                base = loss_fn(p, x, y, v, active, drng)
                if has_ewc:
                    base = base + ewc_penalty(p, ewc_old, ewc_fisher, ewc_lambda,
                                              jnp.sum(v))
                return base

            loss, grads = jax.value_and_grad(total_loss)(params)
            grads = clip_global_norm(grads, 1.0)
            params, opt = adamw_update(params, grads, opt, lr * lr_scale)
            return params, opt, loss_sum + loss, rng_

        params, opt, loss_sum, _ = jax.lax.fori_loop(
            0, n_batches, batch_step, (params, opt, jnp.zeros(()), brng)
        )
        avg = loss_sum / n_batches.astype(jnp.float32)

        # plateau scheduler (factor .5, patience 2, rel threshold 1e-4)
        if use_scheduler:
            improved_s = avg < sched_best * (1 - 1e-4)
            sched_best = jnp.where(improved_s, avg, sched_best)
            sc = jnp.where(improved_s, 0, sc + 1)
            decay = sc > 2
            lr_scale = jnp.where(decay, lr_scale * 0.5, lr_scale)
            sc = jnp.where(decay, 0, sc)

        # early stopping (patience on avg epoch loss)
        improved = avg < best
        best = jnp.where(improved, avg, best)
        pc = jnp.where(improved, 0, pc + 1)
        stop = pc >= patience
        return (params, opt, epoch + 1, rng, best, pc, sched_best, sc, lr_scale, avg, stop)

    def cond(state):
        epoch, stop = state[2], state[10]
        return jnp.logical_and(epoch < max_epochs, jnp.logical_not(stop))

    init = (
        params, adamw_init(params), jnp.zeros((), jnp.int32), rng,
        jnp.asarray(jnp.inf), jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf), jnp.zeros((), jnp.int32),
        jnp.ones(()), jnp.zeros(()), jnp.asarray(False),
    )
    final = jax.lax.while_loop(cond, epoch_body, init)
    return TrainResult(params=final[0], final_loss=final[9], epochs_run=final[2])


# ---------------------------------------------------------------------------
# post-incremental prototype recalibration
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("has_head", "steps", "lr", "l2"))
def fit_proto_bias(
    sims: jax.Array,         # [N, C] masked exp(−d²) similarities
    logits: jax.Array,       # [N, C] raw head logits (ignored if !has_head)
    labels: jax.Array,       # [N] int32 class ids
    vmask: jax.Array,        # [N] bool — real rows
    proto_valid: jax.Array,  # [C] bool
    active: jax.Array,       # [C] bool
    proto_w: jax.Array,      # [C] per-label fusion weights
    head_w: jax.Array,       # [C]
    has_head: bool,
    steps: int = 300,
    lr: float = 0.05,
    l2: float = 1e-3,
) -> Tuple[jax.Array, jax.Array]:
    """Fit a per-class prototype-softmax bias on the stored embeddings.

    The fix for the reference's issue-#53 regime (new-class addition drops
    old-class accuracy ≥10%, tests/test_new_class_accuracy_preservation.py:
    188-198): adding prototypes renormalizes the prototype softmax and the
    freshly (over)trained head is biased toward the new classes, so
    borderline old-class queries flip.  EWC cannot fix it — the failure is
    prototype-side (docs/architecture.md deviation #6).  Here we minimize
    the class-balanced CE of the FUSED distribution (exact
    ``_predict_regular`` semantics) over the replay store w.r.t. a per-class
    additive logit bias — C scalars, so it cannot overfit, and zero bias is
    exact reference behavior.

    Returns ``(bias [C], final_loss)``; the whole fit is ONE XLA program
    (lax.scan over Adam steps on precomputed sims/logits).
    """
    N, C = sims.shape
    counts = jnp.zeros((C,)).at[labels].add(jnp.where(vmask, 1.0, 0.0))
    w = jnp.where(vmask, 1.0 / jnp.maximum(counts[labels], 1.0), 0.0)
    w = w / jnp.maximum(jnp.sum(w), 1e-9)

    base_logits = jnp.where(proto_valid[None, :], sims, -1e9)
    if has_head:
        hmask = jnp.where(active[None, :], logits, -1e9)
        head_probs = jax.nn.softmax(hmask, axis=-1)
        head_probs = jnp.where(active[None, :], head_probs, 0.0)
    else:
        head_probs = jnp.zeros_like(sims)

    safe_labels = jnp.clip(labels, 0, C - 1)

    def loss_fn(b):
        pl_ = jnp.where(proto_valid[None, :],
                        base_logits + b[None, :], base_logits)
        proto_scores = jax.nn.softmax(pl_, axis=-1)
        proto_scores = jnp.where(proto_valid[None, :], proto_scores, 0.0)
        combined = proto_scores * proto_w[None, :]
        if has_head:
            combined = combined + head_probs * head_w[None, :]
        total = jnp.sum(combined, axis=-1, keepdims=True)
        p = combined / jnp.maximum(total, 1e-12)
        pc = jnp.take_along_axis(p, safe_labels[:, None], axis=1)[:, 0]
        ce = -jnp.log(jnp.maximum(pc, 1e-12))
        return jnp.sum(w * ce) + l2 * jnp.sum(b * b)

    def body(carry, _):
        b, opt = carry
        loss, g = jax.value_and_grad(loss_fn)(b)
        b, opt = adamw_update(b, g, opt, lr, weight_decay=0.0)
        return (b, opt), loss

    b0 = jnp.zeros((C,))
    (b, _), losses = jax.lax.scan(body, (b0, adamw_init(b0)), None,
                                  length=steps)
    return jnp.where(proto_valid, b, 0.0), losses[-1]
