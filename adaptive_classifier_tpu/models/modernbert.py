"""ModernBERT encoder — pure-JAX forward (RoPE, alternating local/global
attention, GeGLU, pre-norm, bias-free).

The reference's published classifiers use ``answerdotai/ModernBERT-base``
alongside classic BERT (reference tests/test_enterprise_classifiers_
integration.py model list; SURVEY.md §4).  Architecture implemented from the
public model structure:

- token embeddings → LayerNorm (no position embeddings; rotary at attention)
- per layer: pre-norm attention (layer 0's attention norm is the identity)
  with fused QKV, RoPE (global layers use ``global_rope_theta``, local
  layers ``local_rope_theta``), sliding-window mask of ±local_attention/2
  except every ``global_attn_every_n_layers``-th layer; then pre-norm GeGLU
  MLP (``Wo(gelu(input) · gate)``)
- final LayerNorm; all linear layers and norms bias-free.

Layers are stacked on a leading axis and scanned, like the BERT forward.
Parity is validated against the torch implementation with random weights
(tests/test_hf_parity.py pattern).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import EncoderConfig, _layer_norm


def _rope_tables(S: int, dh: int, theta: float):
    inv_freq = 1.0 / (theta ** (np.arange(0, dh, 2, dtype=np.float64) / dh))
    pos = np.arange(S, dtype=np.float64)
    freqs = np.outer(pos, inv_freq)                       # [S, dh/2]
    emb = np.concatenate([freqs, freqs], axis=-1)         # [S, dh]
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    # x: [B, S, H, Dh]; cos/sin: [S, Dh]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, :, None, :] + rotated * sin[None, :, None, :]


def modernbert_forward(
    params: Dict[str, Any],
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: EncoderConfig,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    B, S = input_ids.shape
    D, H = cfg.hidden_size, cfg.num_heads
    Dh = D // H
    eps = cfg.layer_norm_eps
    zero_b = jnp.zeros((D,), jnp.float32)

    emb = params["embeddings"]
    h = emb["word"][input_ids]
    h = _layer_norm(h, emb["ln_scale"], zero_b, eps).astype(compute_dtype)

    neg = jnp.asarray(-1e9, jnp.float32)
    pad_mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)  # [B,1,1,S]
    dist = jnp.abs(jnp.arange(S)[None, :] - jnp.arange(S)[:, None])
    window = (dist <= cfg.local_attention // 2)[None, None, :, :]
    local_mask = jnp.where(window, pad_mask, neg)                          # [B,1,S,S]

    cos_g, sin_g = _rope_tables(S, Dh, cfg.global_rope_theta)
    cos_l, sin_l = _rope_tables(S, Dh, cfg.local_rope_theta)

    L = cfg.num_layers
    is_global = jnp.asarray(
        [i % cfg.global_attn_every_n_layers == 0 for i in range(L)], jnp.float32
    )
    layer_idx = jnp.arange(L, dtype=jnp.int32)
    scale = 1.0 / np.sqrt(Dh)

    def layer_body(h, xs):
        lp, g, idx = xs
        x = h
        ln = _layer_norm(x, lp["attn_ln_scale"], zero_b, eps)
        attn_in = jnp.where(idx == 0, x, ln)  # layer 0's attn norm is Identity

        qkv = jnp.einsum("bsd,de->bse", attn_in,
                         lp["wqkv"].astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        qkv = qkv.reshape(B, S, 3, H, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        cos = jnp.where(g > 0, cos_g, cos_l)
        sin = jnp.where(g > 0, sin_g, sin_l)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(compute_dtype),
                            k.astype(compute_dtype),
                            preferred_element_type=jnp.float32) * scale
        bias = jnp.where(g > 0, pad_mask, local_mask)
        logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(B, S, D).astype(compute_dtype)
        attn_out = jnp.einsum("bsd,de->bse", ctx, lp["wo"].astype(compute_dtype),
                              preferred_element_type=jnp.float32)
        h = x + attn_out.astype(compute_dtype)

        ln2 = _layer_norm(h, lp["mlp_ln_scale"], zero_b, eps)
        wi = jnp.einsum("bsd,de->bse", ln2, lp["wi"].astype(compute_dtype),
                        preferred_element_type=jnp.float32)
        inp, gate = jnp.split(wi, 2, axis=-1)
        act = jax.nn.gelu(inp, approximate=False) * gate
        mlp = jnp.einsum("bsf,fd->bsd", act.astype(compute_dtype),
                         lp["wo_mlp"].astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        h = h + mlp.astype(compute_dtype)
        return h, None

    h, _ = jax.lax.scan(layer_body, h, (params["layers"], is_global, layer_idx))
    h = _layer_norm(h, params["final_ln_scale"], zero_b, eps)
    return h.astype(jnp.float32)


def init_modernbert_params(seed: int, cfg: EncoderConfig, dtype=jnp.float32) -> Dict[str, Any]:
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    rng = np.random.default_rng(seed)

    def nrm(shape):
        return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.02, dtype)

    return {
        "embeddings": {"word": nrm((cfg.vocab_size, D)), "ln_scale": jnp.ones((D,), dtype)},
        "layers": {
            "attn_ln_scale": jnp.ones((L, D), dtype),
            "wqkv": nrm((L, D, 3 * D)),
            "wo": nrm((L, D, D)),
            "mlp_ln_scale": jnp.ones((L, D), dtype),
            "wi": nrm((L, D, 2 * I)),
            "wo_mlp": nrm((L, I, D)),
        },
        "final_ln_scale": jnp.ones((D,), dtype),
    }


def map_modernbert_weights(sd: Dict[str, np.ndarray], cfg: EncoderConfig) -> Dict[str, Any]:
    """Map HF ModernBERT tensors (``model.`` prefix optional) into the
    stacked-layer pytree; layer 0's missing attn_norm becomes unit scale."""
    prefixes = ("model.", "")

    def get(name, default=None):
        for p in prefixes:
            if p + name in sd:
                return sd[p + name]
        if default is not None:
            return default
        raise KeyError(name)

    D, L = cfg.hidden_size, cfg.num_layers
    ones = np.ones((D,), np.float32)
    layers = {
        "attn_ln_scale": np.stack([
            get(f"layers.{i}.attn_norm.weight", ones if i == 0 else None)
            for i in range(L)
        ]),
        "wqkv": np.stack([get(f"layers.{i}.attn.Wqkv.weight").T for i in range(L)]),
        "wo": np.stack([get(f"layers.{i}.attn.Wo.weight").T for i in range(L)]),
        "mlp_ln_scale": np.stack([get(f"layers.{i}.mlp_norm.weight") for i in range(L)]),
        "wi": np.stack([get(f"layers.{i}.mlp.Wi.weight").T for i in range(L)]),
        "wo_mlp": np.stack([get(f"layers.{i}.mlp.Wo.weight").T for i in range(L)]),
    }
    out = {
        "embeddings": {
            "word": get("embeddings.tok_embeddings.weight"),
            "ln_scale": get("embeddings.norm.weight"),
        },
        "layers": layers,
        "final_ln_scale": get("final_norm.weight"),
    }
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), out)
