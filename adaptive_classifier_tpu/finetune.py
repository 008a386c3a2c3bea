"""Supervised-contrastive encoder fine-tuning on the classifier's own data.

The reference keeps its encoder frozen forever (classifier.py:58-85 loads a
pretrained HF model and never trains it) — classification quality is capped
by whatever the pretrained embedding space happens to separate.  This module
goes beyond that: ``AdaptiveClassifier.finetune_encoder()`` adapts the
encoder to the user's OWN labeled examples (the ones already stored via
``add_examples``) with a supervised-contrastive objective (SupCon), so
same-label texts embed close and different-label texts embed far — exactly
the geometry the prototype memory and kNN scoring rely on.

TPU-native shape: the whole fine-tune runs as scanned jitted chunks (the
``pretrain.py`` pattern — K steps per dispatch, on-device batch sampling,
AdamW in the same program), over fixed ``[N, S]`` token matrices staged to
device once.  Two token-corruption views per sentence (the SimCSE trick,
reusing ``apply_mlm_masking``) double the positive pairs and act as data
augmentation for small N.

Loss: SupCon "out" form (Khosla et al. 2020) — for anchor i with positives
P(i) (same label, either view, not itself):

    L_i = -1/|P(i)| * sum_{p in P(i)} log( exp(s_ip/t) / sum_{a != i} exp(s_ia/t) )

Anchors with no positive in the batch contribute zero.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import training
from .models.encoder import EncoderConfig, encoder_forward
from .pretrain import _mean_pool_embed, apply_mlm_masking


def _pooled_embed(params, ids, attn, cfg: EncoderConfig) -> jax.Array:
    """Normalized sentence embedding with the SAME pooling the classifier
    uses at inference (cfg.pooling) — optimizing a different pooled vector
    than the one the memory/head consume would train the wrong geometry."""
    if cfg.pooling == "mean":
        return _mean_pool_embed(params, ids, attn, cfg)
    hidden = encoder_forward(params, ids, attn, cfg, jnp.bfloat16)
    e = hidden[:, 0, :].astype(jnp.float32)   # CLS pooling
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)


def supcon_loss(params, ids, attn, labels, key, cfg: EncoderConfig,
                mask_id: int, temperature: float = 0.1,
                view_mask_prob: float = 0.08) -> jax.Array:
    """Two-view supervised-contrastive loss over one ``[B, S]`` batch."""
    k1, k2 = jax.random.split(key)
    v1, _, _ = apply_mlm_masking(k1, ids, attn, mask_id, cfg.vocab_size,
                                 mask_prob=view_mask_prob)
    v2, _, _ = apply_mlm_masking(k2, ids, attn, mask_id, cfg.vocab_size,
                                 mask_prob=view_mask_prob)
    e = jnp.concatenate([_pooled_embed(params, v1, attn, cfg),
                         _pooled_embed(params, v2, attn, cfg)])  # [2B, D]
    y = jnp.concatenate([labels, labels])                           # [2B]
    n = e.shape[0]
    sims = (e @ e.T) / temperature
    not_self = 1.0 - jnp.eye(n, dtype=sims.dtype)
    # denominator over all non-self pairs
    logits = jnp.where(not_self > 0, sims, -1e9)
    logp = jax.nn.log_softmax(logits, axis=1)                       # [2B, 2B]
    pos = (y[:, None] == y[None, :]).astype(sims.dtype) * not_self
    n_pos = jnp.sum(pos, axis=1)
    per_anchor = -jnp.sum(pos * logp, axis=1) / jnp.maximum(n_pos, 1.0)
    has_pos = (n_pos > 0).astype(sims.dtype)
    return jnp.sum(per_anchor * has_pos) / jnp.maximum(jnp.sum(has_pos), 1.0)


def supcon_loss_multihot(params, ids, attn, y_multihot, key,
                         cfg: EncoderConfig, mask_id: int,
                         temperature: float = 0.1,
                         view_mask_prob: float = 0.08) -> jax.Array:
    """Multi-label SupCon: positives = pairs sharing ≥1 label.

    The single-label form can't represent multi-label data — a text under
    labels {a, b} flattened to two rows would be its own negative.  Here
    ``y_multihot`` is ``[B, L]`` and the positive mask is
    ``(Y @ Y.T) > 0`` (any shared label), diagonal excluded."""
    k1, k2 = jax.random.split(key)
    v1, _, _ = apply_mlm_masking(k1, ids, attn, mask_id, cfg.vocab_size,
                                 mask_prob=view_mask_prob)
    v2, _, _ = apply_mlm_masking(k2, ids, attn, mask_id, cfg.vocab_size,
                                 mask_prob=view_mask_prob)
    e = jnp.concatenate([_pooled_embed(params, v1, attn, cfg),
                         _pooled_embed(params, v2, attn, cfg)])  # [2B, D]
    y = jnp.concatenate([y_multihot, y_multihot]).astype(jnp.float32)
    n = e.shape[0]
    sims = (e @ e.T) / temperature
    not_self = 1.0 - jnp.eye(n, dtype=sims.dtype)
    logits = jnp.where(not_self > 0, sims, -1e9)
    logp = jax.nn.log_softmax(logits, axis=1)
    pos = ((y @ y.T) > 0).astype(sims.dtype) * not_self
    n_pos = jnp.sum(pos, axis=1)
    per_anchor = -jnp.sum(pos * logp, axis=1) / jnp.maximum(n_pos, 1.0)
    has_pos = (n_pos > 0).astype(sims.dtype)
    return jnp.sum(per_anchor * has_pos) / jnp.maximum(jnp.sum(has_pos), 1.0)


@functools.partial(jax.jit, static_argnames=("cfg", "mask_id", "batch",
                                             "n_steps", "lr", "temperature",
                                             "view_mask_prob"))
def supcon_chunk_multihot(params, opt, ids_all, attn_all, y_all, key,
                          cfg: EncoderConfig, mask_id: int, batch: int,
                          n_steps: int, lr: float = 3e-5,
                          temperature: float = 0.1,
                          view_mask_prob: float = 0.08):
    """Multi-label variant of supcon_chunk (same dispatch pattern)."""

    def body(carry, i):
        params, opt = carry
        sub = jax.random.fold_in(key, i)
        k_idx, k_loss = jax.random.split(sub)
        idx = jax.random.randint(k_idx, (batch,), 0, ids_all.shape[0])

        def loss_fn(p):
            return supcon_loss_multihot(
                p, ids_all[idx], attn_all[idx], y_all[idx], k_loss, cfg,
                mask_id, temperature, view_mask_prob)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = training.clip_global_norm(grads, 1.0)
        new_params, new_opt = training.adamw_update(params, grads, opt, lr)
        return (new_params, new_opt), loss

    (params, opt), losses = jax.lax.scan(body, (params, opt),
                                         jnp.arange(n_steps))
    return params, opt, jnp.mean(losses)


def typo_augment(texts, labels, rng, copies: int = 1,
                 word_prob: float = 0.3):
    """Host-side character-typo augmentation (adjacent-swap inside words
    ≥4 chars).  Real users' text arrives misspelled — and adversarial
    perturbations of the adv-SST2 family are exactly such typos — so
    corrupted copies teach the encoder that a word and its typo'd form
    mean the same thing.  Labels are preserved; the SupCon loss then pulls
    a sentence and its corrupted twin together."""
    out_t, out_l = list(texts), list(labels)
    for _ in range(copies):
        for t, l in zip(texts, labels):
            words = t.split(" ")
            for i, w in enumerate(words):
                if len(w) >= 4 and rng.random() < word_prob:
                    j = rng.randrange(1, len(w) - 2)
                    words[i] = w[:j] + w[j + 1] + w[j] + w[j + 2:]
            out_t.append(" ".join(words))
            out_l.append(l)
    return out_t, out_l


@functools.partial(jax.jit, static_argnames=("cfg", "mask_id", "batch",
                                             "n_steps", "lr", "temperature",
                                             "view_mask_prob"))
def supcon_chunk(params, opt, ids_all, attn_all, labels_all, key,
                 cfg: EncoderConfig, mask_id: int, batch: int, n_steps: int,
                 lr: float = 3e-5, temperature: float = 0.1,
                 view_mask_prob: float = 0.08
                 ) -> Tuple[Dict[str, Any], training.AdamW, jax.Array]:
    """``n_steps`` SupCon steps as ONE XLA program (lax.scan), with on-device
    batch sampling from the staged corpus — the ``pretrain.train_chunk``
    dispatch pattern (each host round-trip costs ~0.1 s on a tunneled TPU)."""

    def body(carry, i):
        params, opt = carry
        sub = jax.random.fold_in(key, i)
        k_idx, k_loss = jax.random.split(sub)
        idx = jax.random.randint(k_idx, (batch,), 0, ids_all.shape[0])

        def loss_fn(p):
            return supcon_loss(p, ids_all[idx], attn_all[idx], labels_all[idx],
                               k_loss, cfg, mask_id, temperature,
                               view_mask_prob)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = training.clip_global_norm(grads, 1.0)
        new_params, new_opt = training.adamw_update(params, grads, opt, lr)
        return (new_params, new_opt), loss

    (params, opt), losses = jax.lax.scan(body, (params, opt),
                                         jnp.arange(n_steps))
    return params, opt, jnp.mean(losses)
