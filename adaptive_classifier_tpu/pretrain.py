"""Masked-language-model pretraining — first-party encoder checkpoints.

The reference consumes pretrained HF checkpoints and cannot produce one
(SURVEY.md §2.2 — all native engines are third-party).  This module closes
the loop for the TPU framework: it pretrains our own BERT-family encoders
(models/encoder.py pytrees) with the classic BERT MLM objective and writes
standard HF-layout checkpoints (config.json + model.safetensors + vocab.txt)
that ``Encoder(path)`` — and the HF transformers library — load directly.

TPU-native shape: the whole training step (mask → forward → loss → grads →
AdamW) is ONE jitted program over fixed ``[B, S]`` batches; masking runs on
device from a threaded PRNG key (15% selection, 80/10/10 mask/random/keep,
BERT's recipe); the data pipeline feeds pre-packed int32 id matrices.

Used by scripts/pretrain_encoder.py to produce the committed ``ac-tiny``
real-weight checkpoint trained on an offline real-English corpus.
"""

from __future__ import annotations

import functools
import json
import os
from pathlib import Path
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import training
from .models.encoder import EncoderConfig, encoder_forward, init_params


class MLMParams(NamedTuple):
    """Transform head for MLM (BERT's cls.predictions): dense → gelu → LN →
    decoder tied to the word-embedding matrix + free bias."""

    dense_w: jax.Array   # [D, D]
    dense_b: jax.Array   # [D]
    ln_scale: jax.Array  # [D]
    ln_bias: jax.Array   # [D]
    dec_bias: jax.Array  # [V]


def init_mlm(seed: int, cfg: EncoderConfig) -> MLMParams:
    r = np.random.default_rng(seed + 7)
    D = cfg.hidden_size
    return MLMParams(
        dense_w=jnp.asarray(r.standard_normal((D, D), np.float32) * 0.02),
        dense_b=jnp.zeros((D,), jnp.float32),
        ln_scale=jnp.ones((D,), jnp.float32),
        ln_bias=jnp.zeros((D,), jnp.float32),
        dec_bias=jnp.zeros((cfg.vocab_size,), jnp.float32),
    )


def apply_mlm_masking(
    key: jax.Array,
    ids: jax.Array,          # [B, S] int32
    attention_mask: jax.Array,  # [B, S] int32
    mask_id: int,
    vocab_size: int,
    special_max_id: int = 4,    # ids < this are never masked ([PAD]/[UNK]/[CLS]/[SEP])
    mask_prob: float = 0.15,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """BERT masking on device → (masked_ids, target_ids, loss_mask)."""
    k_sel, k_op, k_rand = jax.random.split(key, 3)
    eligible = (attention_mask > 0) & (ids >= special_max_id)
    sel = (jax.random.uniform(k_sel, ids.shape) < mask_prob) & eligible
    op = jax.random.uniform(k_op, ids.shape)
    rand_ids = jax.random.randint(k_rand, ids.shape, special_max_id, vocab_size)
    masked = jnp.where(sel & (op < 0.8), mask_id, ids)
    masked = jnp.where(sel & (op >= 0.8) & (op < 0.9), rand_ids, masked)
    return masked, ids, sel


def mlm_logits(params: Dict[str, Any], mlm: MLMParams, ids, attention_mask,
               cfg: EncoderConfig, compute_dtype=jnp.bfloat16) -> jax.Array:
    """[B, S, V] float32 — forward + transform + tied decoder."""
    hidden = encoder_forward(params, ids, attention_mask, cfg, compute_dtype,
                             remat=True)
    h = hidden.astype(jnp.float32) @ mlm.dense_w + mlm.dense_b
    h = jax.nn.gelu(h, approximate=False)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
    h = h * mlm.ln_scale + mlm.ln_bias
    word = params["embeddings"]["word"].astype(jnp.float32)    # [V, D]
    return h @ word.T + mlm.dec_bias


def mlm_loss(params, mlm, ids, attention_mask, key, cfg,
             mask_id: int, compute_dtype=jnp.bfloat16):
    masked, targets, sel = apply_mlm_masking(
        key, ids, attention_mask, mask_id, cfg.vocab_size)
    logits = mlm_logits(params, mlm, masked, attention_mask, cfg, compute_dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(sel), 1.0)
    return jnp.sum(jnp.where(sel, nll, 0.0)) / n


def mlm_loss_sparse(params, mlm, ids, attention_mask, key, cfg,
                    mask_id: int, n_pred: int, compute_dtype=jnp.bfloat16):
    """MLM loss with logits computed ONLY at masked positions.

    The dense ``[B, S, V]`` logits tensor dominates MLM step time (≈1 GB of
    HBM traffic per bert-tiny step at B=256/S=128); gathering the ≤``n_pred``
    selected hidden states per row first shrinks the decoder matmul and its
    backward by S/n_pred (≈6×) — the standard BERT implementation trick."""
    masked, targets, sel = apply_mlm_masking(
        key, ids, attention_mask, mask_id, cfg.vocab_size)
    B, S = ids.shape
    # up to n_pred selected positions per row, selected-first order
    u = jax.random.uniform(jax.random.fold_in(key, 17), (B, S))
    rank_key = jnp.where(sel, u, 2.0 + u)
    _, pos = jax.lax.top_k(-rank_key, n_pred)               # [B, n_pred]
    picked_sel = jnp.take_along_axis(sel, pos, axis=1)      # [B, n_pred]
    picked_tgt = jnp.take_along_axis(targets, pos, axis=1)

    hidden = encoder_forward(params, masked, attention_mask, cfg,
                             compute_dtype, remat=True)
    h = jnp.take_along_axis(
        hidden.astype(jnp.float32), pos[..., None], axis=1)  # [B, n_pred, D]
    h = h @ mlm.dense_w + mlm.dense_b
    h = jax.nn.gelu(h, approximate=False)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
    h = h * mlm.ln_scale + mlm.ln_bias
    word = params["embeddings"]["word"].astype(jnp.float32)
    logits = h @ word.T + mlm.dec_bias                       # [B, n_pred, V]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, picked_tgt[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(picked_sel), 1.0)
    return jnp.sum(jnp.where(picked_sel, nll, 0.0)) / n


@functools.partial(jax.jit, static_argnames=("cfg", "mask_id", "lr_peak",
                                             "warmup", "total_steps"))
def train_step(params, mlm, opt, ids, attention_mask, key, cfg,
               mask_id: int, lr_peak: float = 1e-3,
               warmup: int = 1000, total_steps: int = 100_000):
    """One MLM step: loss → grads → clip → AdamW with linear warmup +
    cosine decay.  Entire step is one XLA program."""
    def loss_fn(p):
        return mlm_loss(p["enc"], p["mlm"], ids, attention_mask, key, cfg, mask_id)

    bundle = {"enc": params, "mlm": mlm}
    loss, grads = jax.value_and_grad(loss_fn)(bundle)
    grads = training.clip_global_norm(grads, 1.0)
    t = opt.step.astype(jnp.float32)
    lr = jnp.where(
        t < warmup,
        lr_peak * (t + 1.0) / warmup,
        lr_peak * 0.5 * (1.0 + jnp.cos(
            jnp.pi * jnp.minimum((t - warmup) / max(total_steps - warmup, 1), 1.0))),
    )
    new_bundle, opt = training.adamw_update(bundle, grads, opt, lr)
    return new_bundle["enc"], MLMParams(*new_bundle["mlm"]), opt, loss


@functools.partial(jax.jit, static_argnames=("cfg", "mask_id", "batch",
                                             "lr_peak", "warmup", "total_steps"))
def train_step_sampled(params, mlm, opt, ids_all, attn_all, key, cfg,
                       mask_id: int, batch: int, lr_peak: float = 1e-3,
                       warmup: int = 1000, total_steps: int = 100_000):
    """train_step with ON-DEVICE batch sampling from the packed corpus.

    Host-side per-step index uploads block on the host↔device link (each
    ~20ms on a tunneled TPU — they dominated wall clock); sampling inside
    the program makes the training loop pure async dispatch."""
    k_idx, k_mask = jax.random.split(key)
    idx = jax.random.randint(k_idx, (batch,), 0, ids_all.shape[0])
    return train_step(params, mlm, opt, ids_all[idx], attn_all[idx], k_mask,
                      cfg, mask_id, lr_peak, warmup, total_steps)


@functools.partial(jax.jit, static_argnames=("cfg", "mask_id", "batch",
                                             "n_steps", "lr_peak", "warmup",
                                             "total_steps"))
def train_chunk(params, mlm, opt, ids_all, attn_all, key, cfg,
                mask_id: int, batch: int, n_steps: int,
                lr_peak: float = 1e-3, warmup: int = 1000,
                total_steps: int = 100_000):
    """``n_steps`` MLM steps as ONE XLA program (lax.scan over steps).

    On a tunneled TPU even async dispatches cost ~0.1s each (every returned
    array handle round-trips the link); scanning K steps per dispatch makes
    training wall-clock device-bound.  Returns the mean loss of the chunk.
    """
    n_pred = max(int(ids_all.shape[1] * 0.20), 8)  # budget ≥ the 15% recipe

    def body(carry, i):
        params, mlm, opt = carry
        sub = jax.random.fold_in(key, i)
        k_idx, k_mask = jax.random.split(sub)
        idx = jax.random.randint(k_idx, (batch,), 0, ids_all.shape[0])

        def loss_fn(p):
            return mlm_loss_sparse(p["enc"], p["mlm"], ids_all[idx],
                                   attn_all[idx], k_mask, cfg, mask_id, n_pred)

        bundle = {"enc": params, "mlm": mlm}
        loss, grads = jax.value_and_grad(loss_fn)(bundle)
        grads = training.clip_global_norm(grads, 1.0)
        t = opt.step.astype(jnp.float32)
        lr = jnp.where(
            t < warmup,
            lr_peak * (t + 1.0) / warmup,
            lr_peak * 0.5 * (1.0 + jnp.cos(
                jnp.pi * jnp.minimum(
                    (t - warmup) / max(total_steps - warmup, 1), 1.0))),
        )
        new_bundle, new_opt = training.adamw_update(bundle, grads, opt, lr)
        return (new_bundle["enc"], MLMParams(*new_bundle["mlm"]), new_opt), loss

    (params, mlm, opt), losses = jax.lax.scan(
        body, (params, mlm, opt), jnp.arange(n_steps))
    return params, mlm, opt, jnp.mean(losses)


# ---------------------------------------------------------------------------
# contrastive sentence-embedding phase (unsupervised, SimCSE-family)
# ---------------------------------------------------------------------------

def _mean_pool_embed(params, ids, attn, cfg, compute_dtype=jnp.bfloat16):
    h = encoder_forward(params, ids, attn, cfg, compute_dtype, remat=True)
    m = attn[:, :, None].astype(h.dtype)
    e = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    e = e.astype(jnp.float32)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)


def contrastive_loss(params, ids, attn, key, cfg, mask_id: int,
                     temperature: float = 0.05, view_mask_prob: float = 0.1):
    """Two token-corruption views of each sentence must embed closer to each
    other than to any other sentence in the batch (InfoNCE, in-batch
    negatives).  Unsupervised — MLM gives lexical knowledge, this phase
    shapes the *sentence geometry* the classifier's kNN/prototypes rely on
    (an MLM-only encoder's pooled states are weak sentence summaries)."""
    k1, k2 = jax.random.split(key)
    v1, _, _ = apply_mlm_masking(k1, ids, attn, mask_id, cfg.vocab_size,
                                 mask_prob=view_mask_prob)
    v2, _, _ = apply_mlm_masking(k2, ids, attn, mask_id, cfg.vocab_size,
                                 mask_prob=view_mask_prob)
    e1 = _mean_pool_embed(params, v1, attn, cfg)
    e2 = _mean_pool_embed(params, v2, attn, cfg)
    sims = e1 @ e2.T / temperature                 # [B, B]
    B = sims.shape[0]
    targets = jnp.arange(B)
    logp_12 = jax.nn.log_softmax(sims, axis=1)
    logp_21 = jax.nn.log_softmax(sims.T, axis=1)
    nll = -(logp_12[targets, targets] + logp_21[targets, targets]) / 2.0
    return jnp.mean(nll)


@functools.partial(jax.jit, static_argnames=("cfg", "mask_id", "batch",
                                             "n_steps", "lr", "view_mask_prob"))
def contrastive_chunk(params, opt, ids_all, attn_all, key, cfg,
                      mask_id: int, batch: int, n_steps: int,
                      lr: float = 1e-4, view_mask_prob: float = 0.1):
    """``n_steps`` contrastive steps as one XLA program (lax.scan)."""
    def body(carry, i):
        params, opt = carry
        sub = jax.random.fold_in(key, i)
        k_idx, k_loss = jax.random.split(sub)
        idx = jax.random.randint(k_idx, (batch,), 0, ids_all.shape[0])

        def loss_fn(p):
            return contrastive_loss(p, ids_all[idx], attn_all[idx], k_loss,
                                    cfg, mask_id,
                                    view_mask_prob=view_mask_prob)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = training.clip_global_norm(grads, 1.0)
        new_params, new_opt = training.adamw_update(params, grads, opt, lr)
        return (new_params, new_opt), loss

    (params, opt), losses = jax.lax.scan(body, (params, opt),
                                         jnp.arange(n_steps))
    return params, opt, jnp.mean(losses)


# ---------------------------------------------------------------------------
# HF-layout checkpoint export (inverse of encoder._map_hf_weights)
# ---------------------------------------------------------------------------

def to_hf_state_dict(params: Dict[str, Any], cfg: EncoderConfig) -> Dict[str, np.ndarray]:
    """Stacked-layer pytree → HF BERT tensor names (torch [out, in] layout)."""
    sd: Dict[str, np.ndarray] = {}
    emb = jax.tree.map(lambda a: np.asarray(a, np.float32), params["embeddings"])
    lay = jax.tree.map(lambda a: np.asarray(a, np.float32), params["layers"])
    sd["bert.embeddings.word_embeddings.weight"] = emb["word"]
    sd["bert.embeddings.position_embeddings.weight"] = emb["position"]
    sd["bert.embeddings.token_type_embeddings.weight"] = emb["token_type"]
    sd["bert.embeddings.LayerNorm.weight"] = emb["ln_scale"]
    sd["bert.embeddings.LayerNorm.bias"] = emb["ln_bias"]
    names = {
        "q": "attention.self.query", "k": "attention.self.key",
        "v": "attention.self.value", "o": "attention.output.dense",
        "attn_ln": "attention.output.LayerNorm",
        "ffn_in": "intermediate.dense", "ffn_out": "output.dense",
        "ffn_ln": "output.LayerNorm",
    }
    for i in range(cfg.num_layers):
        base = f"bert.encoder.layer.{i}."
        for key in ("q", "k", "v", "o", "ffn_in", "ffn_out"):
            # ascontiguousarray is load-bearing: safetensors' numpy writer
            # serializes the UNDERLYING BUFFER of a non-contiguous view with
            # the view's shape metadata — a silent transpose corruption
            # (tests/test_pretrain.py::test_safetensors_transposed_view_roundtrip)
            sd[base + names[key] + ".weight"] = np.ascontiguousarray(
                lay[f"{key}_w"][i].T)  # [out, in]
            sd[base + names[key] + ".bias"] = lay[f"{key}_b"][i]
        for key in ("attn_ln", "ffn_ln"):
            sd[base + names[key] + ".weight"] = lay[f"{key}_scale"][i]
            sd[base + names[key] + ".bias"] = lay[f"{key}_bias"][i]
    return sd


def save_hf_checkpoint(params: Dict[str, Any], cfg: EncoderConfig,
                       out_dir, vocab_tokens, extra_config: Dict[str, Any] = None):
    """Write an HF-layout local checkpoint: config.json + model.safetensors +
    vocab.txt.  Loads through Encoder(path) AND transformers.BertModel."""
    from safetensors.numpy import save_file

    out = Path(out_dir)
    os.makedirs(out, exist_ok=True)
    config = {
        "model_type": "bert",
        "architectures": ["BertModel"],
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "type_vocab_size": max(cfg.type_vocab_size, 1),
        "layer_norm_eps": cfg.layer_norm_eps,
        "pad_token_id": cfg.pad_token_id,
        "hidden_act": "gelu",
    }
    config.update(extra_config or {})
    (out / "config.json").write_text(json.dumps(config, indent=2))
    save_file(to_hf_state_dict(params, cfg), str(out / "model.safetensors"))
    (out / "vocab.txt").write_text("\n".join(vocab_tokens) + "\n", encoding="utf-8")
    (out / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "BertTokenizer", "do_lower_case": True,
    }))
    return out
