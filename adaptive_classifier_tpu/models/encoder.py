"""Pure-JAX transformer encoder (BERT family).

TPU-native replacement for the reference's torch/ONNX embedding backbone
(reference: src/adaptive_classifier/classifier.py:58-85,1249-1282).  Instead of
wrapping a foreign runtime, the encoder is a jitted JAX forward:

- parameters are a pytree with all layers **stacked** on a leading axis and the
  forward is a ``lax.scan`` over layers — one layer body compiled once,
  friendly to pipeline/tensor sharding;
- matmuls run in bfloat16 on the MXU with float32 layernorm/softmax statistics;
- the CLS-pool + L2-normalize epilogue is fused into the same jit, so
  tokenize → embed is host→device once per batch.

Weights load from any local HuggingFace BERT/DistilBERT checkpoint
(model.safetensors / pytorch_model.bin).  With no checkpoint available the
encoder falls back to deterministic random initialization with the named
architecture's exact shapes, so the full pipeline runs hermetically.
"""

from __future__ import annotations

import functools
import json
import logging
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    arch: str = "bert"  # bert | distilbert | roberta | modernbert | electra | mpnet | deberta
    #: sentence pooling: "cls" (reference semantics) or "mean" (masked mean
    #: — used by our MLM-only pretrained checkpoints via config.json's
    #: "ac_pooling" key)
    pooling: str = "cls"
    #: pool after this many transformer layers (0 = all layers).  Middle
    #: layers of MLM-pretrained encoders often transfer better to sentence
    #: tasks than the last layer (which specializes toward the MLM
    #: objective); persisted via config.json's "ac_pool_layer" key
    pool_layer: int = 0
    # ModernBERT-specific (ignored by classic BERT)
    global_attn_every_n_layers: int = 3
    local_attention: int = 128
    global_rope_theta: float = 160000.0
    local_rope_theta: float = 10000.0
    #: ELECTRA: embedding-table width when it differs from hidden_size
    #: (0 = same); a learned [E→D] projection follows the embedding
    #: LayerNorm (HF ElectraModel.embeddings_project)
    embedding_size: int = 0
    #: MPNet: T5-style bucketed relative attention bias, one learned
    #: [buckets, H] table shared by every layer (0 = absent).  The bucket
    #: matrix is a static function of S, computed on host at trace time.
    relative_attn_buckets: int = 0
    relative_attn_max_distance: int = 128
    #: DeBERTa-v2/v3 disentangled attention.  ``rel_att_span`` is K — the
    #: per-direction position span (position_buckets when bucketed, else
    #: max_relative_positions); the shared relative-embedding table has
    #: 2K rows.  0 = no relative attention.  ``rel_att_buckets`` is the HF
    #: position_buckets value (0 = unbucketed raw offsets), ``rel_att_max_pos``
    #: the log-bucket max_position, ``rel_pos_att`` the enabled score terms
    #: ("c2p|p2c" for v3), ``rel_norm`` whether the table gets the encoder
    #: -level LayerNorm (norm_rel_ebd="layer_norm"), and
    #: ``position_biased_input`` whether absolute position embeddings are
    #: added (v3 keeps them; some v2 variants drop them).
    rel_att_span: int = 0
    rel_att_buckets: int = 0
    rel_att_max_pos: int = 0
    rel_pos_att: str = ""
    rel_norm: bool = False
    position_biased_input: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


#: named architectures for offline (weightless) operation — exact dims of the
#: HF models the reference's tests use (SURVEY.md §4)
KNOWN_ARCHS: Dict[str, EncoderConfig] = {
    "prajjwal1/bert-tiny": EncoderConfig(hidden_size=128, num_layers=2, num_heads=2, intermediate_size=512),
    "bert-base-uncased": EncoderConfig(),
    "bert-base-cased": EncoderConfig(vocab_size=28996),
    "google-bert/bert-large-cased": EncoderConfig(vocab_size=28996, hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096),
    "bert-large-uncased": EncoderConfig(hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096),
    "distilbert-base-uncased": EncoderConfig(num_layers=6, type_vocab_size=0, arch="distilbert"),
    "distilbert-base-cased": EncoderConfig(vocab_size=28996, num_layers=6, type_vocab_size=0, arch="distilbert"),
    "answerdotai/ModernBERT-base": EncoderConfig(
        vocab_size=50368, hidden_size=768, num_layers=22, num_heads=12,
        intermediate_size=1152, max_position_embeddings=8192,
        type_vocab_size=0, layer_norm_eps=1e-5, arch="modernbert",
    ),
    "answerdotai/ModernBERT-large": EncoderConfig(
        vocab_size=50368, hidden_size=1024, num_layers=28, num_heads=16,
        intermediate_size=2624, max_position_embeddings=8192,
        type_vocab_size=0, layer_norm_eps=1e-5, arch="modernbert",
    ),
    "google/electra-small-discriminator": EncoderConfig(
        hidden_size=256, num_layers=12, num_heads=4, intermediate_size=1024,
        embedding_size=128, arch="electra",
    ),
    "google/electra-base-discriminator": EncoderConfig(arch="electra"),
    "microsoft/mpnet-base": EncoderConfig(
        vocab_size=30527, max_position_embeddings=514, type_vocab_size=0,
        layer_norm_eps=1e-5, pad_token_id=1, arch="mpnet",
        relative_attn_buckets=32,
    ),
    "sentence-transformers/all-mpnet-base-v2": EncoderConfig(
        vocab_size=30527, max_position_embeddings=514, type_vocab_size=0,
        layer_norm_eps=1e-5, pad_token_id=1, arch="mpnet",
        relative_attn_buckets=32, pooling="mean",
    ),
    "microsoft/deberta-v3-base": EncoderConfig(
        vocab_size=128100, type_vocab_size=0, layer_norm_eps=1e-7,
        arch="deberta", rel_att_span=256, rel_att_buckets=256,
        rel_att_max_pos=512, rel_pos_att="p2c|c2p", rel_norm=True,
    ),
    "microsoft/deberta-v3-xsmall": EncoderConfig(
        vocab_size=128100, hidden_size=384, num_layers=12, num_heads=6,
        intermediate_size=1536, type_vocab_size=0, layer_norm_eps=1e-7,
        arch="deberta", rel_att_span=256, rel_att_buckets=256,
        rel_att_max_pos=512, rel_pos_att="p2c|c2p", rel_norm=True,
    ),
}


def config_for_model_name(name: str) -> EncoderConfig:
    if name in KNOWN_ARCHS:
        return KNOWN_ARCHS[name]
    lowered = name.lower()
    if "modernbert" in lowered:
        key = "answerdotai/ModernBERT-large" if "large" in lowered else "answerdotai/ModernBERT-base"
        return KNOWN_ARCHS[key]
    if "mpnet" in lowered:
        return KNOWN_ARCHS["microsoft/mpnet-base"]
    if "electra" in lowered:
        key = ("google/electra-small-discriminator" if "small" in lowered
               else "google/electra-base-discriminator")
        return KNOWN_ARCHS[key]
    if "deberta" in lowered:
        key = ("microsoft/deberta-v3-xsmall" if "xsmall" in lowered
               else "microsoft/deberta-v3-base")
        return KNOWN_ARCHS[key]
    if "tiny" in lowered:
        return KNOWN_ARCHS["prajjwal1/bert-tiny"]
    if "large" in lowered:
        return KNOWN_ARCHS["bert-large-uncased"]
    if "distil" in lowered:
        return KNOWN_ARCHS["distilbert-base-uncased"]
    return EncoderConfig()


# ---------------------------------------------------------------------------
# parameter initialization
# ---------------------------------------------------------------------------

def init_params(seed: int, cfg: EncoderConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """BERT-style init: normal(0.02) weights, zero biases, unit layernorm.

    Generated with a seeded numpy RNG on host (one device_put, no per-tensor
    jit dispatches) — deterministic across processes and platforms.
    """
    if cfg.arch == "modernbert":
        from .modernbert import init_modernbert_params

        return init_modernbert_params(seed, cfg, dtype)
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    E = cfg.embedding_size or D     # ELECTRA: narrow embedding table
    rng = np.random.default_rng(seed)

    def nrm(shape):
        return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.02, dtype)

    params = {
        "embeddings": {
            "word": nrm((cfg.vocab_size, E)),
            "position": nrm((cfg.max_position_embeddings, E)),
            "token_type": nrm((max(cfg.type_vocab_size, 1), E)),
            "ln_scale": jnp.ones((E,), dtype),
            "ln_bias": jnp.zeros((E,), dtype),
        },
        "layers": {
            "q_w": nrm((L, D, D)), "q_b": jnp.zeros((L, D), dtype),
            "k_w": nrm((L, D, D)), "k_b": jnp.zeros((L, D), dtype),
            "v_w": nrm((L, D, D)), "v_b": jnp.zeros((L, D), dtype),
            "o_w": nrm((L, D, D)), "o_b": jnp.zeros((L, D), dtype),
            "attn_ln_scale": jnp.ones((L, D), dtype), "attn_ln_bias": jnp.zeros((L, D), dtype),
            "ffn_in_w": nrm((L, D, F)), "ffn_in_b": jnp.zeros((L, F), dtype),
            "ffn_out_w": nrm((L, F, D)), "ffn_out_b": jnp.zeros((L, D), dtype),
            "ffn_ln_scale": jnp.ones((L, D), dtype), "ffn_ln_bias": jnp.zeros((L, D), dtype),
        },
    }
    if E != D:                       # ELECTRA embeddings_project
        params["embeddings"]["proj_w"] = nrm((E, D))
        if cfg.arch != "deberta":    # DeBERTa embed_proj has no bias
            params["embeddings"]["proj_b"] = jnp.zeros((D,), dtype)
    if cfg.relative_attn_buckets:    # MPNet shared relative attention bias
        params["embeddings"]["rel_bias"] = nrm(
            (cfg.relative_attn_buckets, cfg.num_heads))
    if cfg.rel_att_span:             # DeBERTa shared relative embedding table
        params["embeddings"]["rel_emb"] = nrm((2 * cfg.rel_att_span, D))
        if cfg.rel_norm:
            params["embeddings"]["rel_ln_scale"] = jnp.ones((D,), dtype)
            params["embeddings"]["rel_ln_bias"] = jnp.zeros((D,), dtype)
    return params


def init_params_on_device(seed: int, cfg: EncoderConfig) -> Dict[str, Any]:
    """Random-init directly in HBM (one jitted program, no host transfer).

    For benchmarks/dry-runs: host-side ``init_params`` moves ~4 bytes/param
    through the host↔device link (~340 MB for bert-base), which dominates
    startup on tunneled devices.  Weight distribution matches
    ``init_params``'s guarantees (normal·0.02), not its bit pattern.
    """
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    @functools.partial(jax.jit, static_argnums=())
    def build(key):
        ks = jax.random.split(key, 9)
        n = lambda k, shape: jax.random.normal(k, shape, jnp.float32) * 0.02
        return {
            "embeddings": {
                "word": n(ks[0], (cfg.vocab_size, D)),
                "position": n(ks[1], (cfg.max_position_embeddings, D)),
                "token_type": n(ks[2], (max(cfg.type_vocab_size, 1), D)),
                "ln_scale": jnp.ones((D,)), "ln_bias": jnp.zeros((D,)),
            },
            "layers": {
                "q_w": n(ks[3], (L, D, D)), "q_b": jnp.zeros((L, D)),
                "k_w": n(ks[4], (L, D, D)), "k_b": jnp.zeros((L, D)),
                "v_w": n(ks[5], (L, D, D)), "v_b": jnp.zeros((L, D)),
                "o_w": n(ks[6], (L, D, D)), "o_b": jnp.zeros((L, D)),
                "attn_ln_scale": jnp.ones((L, D)), "attn_ln_bias": jnp.zeros((L, D)),
                "ffn_in_w": n(ks[7], (L, D, F)), "ffn_in_b": jnp.zeros((L, F)),
                "ffn_out_w": n(ks[8], (L, F, D)), "ffn_out_b": jnp.zeros((L, D)),
                "ffn_ln_scale": jnp.ones((L, D)), "ffn_ln_bias": jnp.zeros((L, D)),
            },
        }

    return build(jax.random.PRNGKey(seed))


# ---------------------------------------------------------------------------
# forward pass
# ---------------------------------------------------------------------------

def _relative_position_buckets(S: int, num_buckets: int,
                               max_distance: int) -> np.ndarray:
    """MPNet/T5 bidirectional relative-position bucket matrix ``[S, S]``.

    Static in S, so it is computed with numpy at trace time and baked into
    the program as a constant gather index (reference semantics:
    transformers MPNetModel.relative_position_bucket — sign takes half the
    buckets, then exact buckets up to max_exact and log-spaced beyond)."""
    ctx = np.arange(S)[:, None]
    mem = np.arange(S)[None, :]
    n = -(mem - ctx)
    half = num_buckets // 2
    ret = (n < 0).astype(np.int64) * half
    n = np.abs(n)
    max_exact = half // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact) * (half - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, half - 1)
    return ret + np.where(is_small, n, large)


def _deberta_rel_positions(S: int, bucket_size: int, max_position: int) -> np.ndarray:
    """DeBERTa-v2 (log-bucketed) relative position matrix ``[S, S]``.

    rel[i, j] = bucket(i - j): exact offsets inside ±bucket_size/2, then
    log-spaced with the sign preserved (HF make_log_bucket_position /
    build_relative_position semantics — float32 math to match torch's ceil
    boundaries).  Static in S → numpy at trace time, baked as a constant."""
    q = np.arange(S, dtype=np.int64)
    rel = q[:, None] - q[None, :]
    if bucket_size > 0 and max_position > 0:
        sign = np.sign(rel).astype(np.float32)
        mid = bucket_size // 2
        abs_pos = np.where((rel < mid) & (rel > -mid), mid - 1, np.abs(rel))
        log_pos = np.ceil(
            np.log(abs_pos.astype(np.float32) / mid)
            / np.log(np.float32((max_position - 1) / mid)) * (mid - 1)
        ).astype(np.float32) + mid
        rel = np.where(abs_pos <= mid, rel,
                       (log_pos * sign).astype(np.int64))
    return rel


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def encoder_forward(
    params: Dict[str, Any],
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: EncoderConfig,
    compute_dtype=jnp.bfloat16,
    use_flash: bool = False,
    remat: bool = False,
    attn_impl: Optional[str] = None,
) -> jax.Array:
    """Full encoder forward → last_hidden_state ``[B, S, D]`` (float32).

    ``attn_impl`` selects the attention implementation: ``"einsum"`` (XLA
    fusion, short sequences), ``"oneshot"`` (Pallas whole-head-in-VMEM, the
    S ≤ 512 kernel), ``"flash"`` (Pallas online-softmax streaming, the long
    -context path).  ``None`` derives it from the legacy ``use_flash`` flag
    ("flash" / "einsum").

    ``remat=True`` rematerializes each layer in the backward pass
    (``jax.checkpoint`` on the scan body) — trades ~1/3 extra FLOPs for
    activation memory that no longer scales with depth.  Used by the MLM
    pretrainer (8L/512H at B=256 exceeds v5e HBM without it); inference
    paths never need it.
    """
    if attn_impl is None:
        attn_impl = "flash" if use_flash else "einsum"
    if cfg.arch == "modernbert":
        from .modernbert import modernbert_forward

        return modernbert_forward(params, input_ids, attention_mask, cfg, compute_dtype)
    B, S = input_ids.shape
    emb = params["embeddings"]
    h = emb["word"][input_ids]
    if cfg.arch == "deberta":
        # DeBERTa embedding order differs from ELECTRA's: optional absolute
        # positions (position_biased_input), optional bias-free embed_proj
        # widening, THEN LayerNorm at hidden_size, then pad rows zeroed
        # (HF DebertaV2Embeddings.forward masks the embedding output)
        if cfg.position_biased_input:
            h = h + emb["position"][jnp.arange(S)][None, :, :]
        if cfg.type_vocab_size > 0:
            h = h + emb["token_type"][0][None, None, :]
        if "proj_w" in emb:
            h = h @ emb["proj_w"]
        h = _layer_norm(h, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
        h = h * attention_mask[:, :, None].astype(h.dtype)
    else:
        if cfg.arch in ("roberta", "mpnet"):
            # RoBERTa/MPNet position ids: pad positions get padding_idx, real
            # tokens get cumsum(mask) + padding_idx (first real at pad_id+1)
            pad = cfg.pad_token_id
            mask_i = (input_ids != pad).astype(jnp.int32)
            pos_ids = jnp.cumsum(mask_i, axis=1) * mask_i + pad
            h = h + emb["position"][pos_ids]
        else:
            h = h + emb["position"][jnp.arange(S)][None, :, :]
        if cfg.type_vocab_size > 0:
            h = h + emb["token_type"][0][None, None, :]
        h = _layer_norm(h, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
        if "proj_w" in emb:
            # ELECTRA: embedding LayerNorm runs at embedding_size, then a
            # learned projection widens to hidden_size (embeddings_project)
            h = h @ emb["proj_w"] + emb["proj_b"]
    h = h.astype(compute_dtype)

    # additive attention mask [B, 1, 1, S]
    neg = jnp.asarray(-1e9, jnp.float32)
    amask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
    if cfg.relative_attn_buckets:
        # MPNet: learned bucketed relative attention bias, shared across
        # layers — folded into the additive mask once ([1,H,S,S] + [B,1,1,S]
        # broadcast).  The Pallas attention kernels take only the [B,S] pad
        # mask, so MPNet pins the einsum path (fine at MPNet's 512-token
        # envelope; parity first — reference wraps any AutoModel,
        # /root/reference/src/adaptive_classifier/classifier.py:59-83).
        buckets = _relative_position_buckets(
            S, cfg.relative_attn_buckets, cfg.relative_attn_max_distance)
        rel = emb["rel_bias"][jnp.asarray(buckets)]          # [S, S, H]
        amask = amask + jnp.transpose(rel, (2, 0, 1))[None].astype(jnp.float32)
        attn_impl = "einsum"

    # DeBERTa disentangled attention: trace-time constants + the (optionally
    # LayerNormed) shared relative-embedding table.  The per-layer position
    # query/key projections reuse the layer's own q/k weights
    # (share_att_key=True — the v2/v3 published configs); the c2p/p2c score
    # gathers are static [S,S] index maps (HF DisentangledSelfAttention
    # .disentangled_attention_bias semantics).
    deberta_rel = None
    if cfg.arch == "deberta" and cfg.rel_att_span:
        K = cfg.rel_att_span
        rel_pos = _deberta_rel_positions(
            S, cfg.rel_att_buckets, cfg.rel_att_max_pos)        # [S, S]
        c2p_idx = np.clip(rel_pos + K, 0, 2 * K - 1)
        # p2c gather index (pre-transpose): idx[j, l] = clamp(-rel[j, l] + K)
        p2c_idx = np.clip(-rel_pos + K, 0, 2 * K - 1)
        table = emb["rel_emb"]
        if cfg.rel_norm:
            table = _layer_norm(table, emb["rel_ln_scale"],
                                emb["rel_ln_bias"], cfg.layer_norm_eps)
        deberta_rel = (
            table.astype(compute_dtype),
            jnp.asarray(c2p_idx, jnp.int32),
            jnp.asarray(p2c_idx, jnp.int32),
        )
        attn_impl = "einsum"

    H, Dh = cfg.num_heads, cfg.head_dim
    scale = 1.0 / np.sqrt(Dh)
    if cfg.arch == "deberta":
        # scale_factor = 1 + |pos_att_type| — scores AND both disentangled
        # bias terms divide by sqrt(head_dim * scale_factor)
        n_pos = len([t for t in cfg.rel_pos_att.split("|") if t]) if deberta_rel else 0
        scale = 1.0 / np.sqrt(Dh * (1 + n_pos))
    from ..ops.layernorm import add_layer_norm

    # measured on v5e: the Pallas add+LN kernel is slightly SLOWER than
    # XLA's own convert+reduce fusion (6555 vs 6837 q/s end-to-end) — XLA
    # already fuses the LN epilogue optimally and the kernel call breaks
    # surrounding fusions.  Kept off; ops/layernorm.py documents the result.
    use_fused_ln = False

    # fused QKV: one [D, 3D] matmul per layer instead of three [D, D] —
    # measured +2.7% end-to-end on v5e; the concat hoists out of the scan
    layers = dict(params["layers"])
    layers["qkv_w"] = jnp.concatenate(
        [layers.pop("q_w"), layers.pop("k_w"), layers.pop("v_w")], axis=2)
    layers["qkv_b"] = jnp.concatenate(
        [layers.pop("q_b"), layers.pop("k_b"), layers.pop("v_b")], axis=1)
    if 0 < cfg.pool_layer < cfg.num_layers:
        # truncate the stacked-layer pytree: run (and pay for) only the
        # first pool_layer layers — a static slice, so each depth compiles
        # its own (cheaper) program
        layers = jax.tree.map(lambda a: a[: cfg.pool_layer], layers)

    def layer_body(h, lp):
        x = h
        qkv = jnp.einsum("bsd,de->bse", x, lp["qkv_w"].astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        qkv = (qkv + lp["qkv_b"].astype(jnp.float32)).astype(compute_dtype)
        if attn_impl == "fusedqkv":
            # all-heads Pallas attention on the packed QKV tensor — skips
            # the [B,S,H,Dh] head split and its layout copies entirely
            # (ops/attention_qkv.py; round-3 MFU trace finding)
            from ..ops.attention_qkv import attention_from_qkv

            ctx = attention_from_qkv(qkv, attention_mask, H, Dh)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, S, H, Dh)
            k = k.reshape(B, S, H, Dh)
            v = v.reshape(B, S, H, Dh)

            if attn_impl == "flash":
                from ..ops.flash_attention import flash_attention

                ctx = flash_attention(q, k, v, attention_mask)
            elif attn_impl == "oneshot":
                from ..ops.flash_attention import oneshot_attention

                ctx = oneshot_attention(q, k, v, attention_mask)
            else:
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                    preferred_element_type=jnp.float32) * scale
                if deberta_rel is not None:
                    table, c2p_idx, p2c_idx = deberta_rel
                    D = cfg.hidden_size
                    K2 = table.shape[0]
                    # position keys/queries: the layer's own projections
                    # applied to the shared table (share_att_key)
                    qw, qb = lp["qkv_w"][:, :D], lp["qkv_b"][:D]
                    kw, kb = lp["qkv_w"][:, D:2 * D], lp["qkv_b"][D:2 * D]
                    if "c2p" in cfg.rel_pos_att:
                        pos_k = (table @ kw.astype(compute_dtype)
                                 + kb.astype(compute_dtype)).reshape(K2, H, Dh)
                        c2p = jnp.einsum("bqhd,khd->bhqk", q, pos_k,
                                         preferred_element_type=jnp.float32)
                        c2p = jnp.take_along_axis(
                            c2p, jnp.broadcast_to(c2p_idx[None, None],
                                                  (B, H, S, S)), axis=-1)
                        logits = logits + c2p * scale
                    if "p2c" in cfg.rel_pos_att:
                        pos_q = (table @ qw.astype(compute_dtype)
                                 + qb.astype(compute_dtype)).reshape(K2, H, Dh)
                        p2c = jnp.einsum("bjhd,khd->bhjk", k, pos_q,
                                         preferred_element_type=jnp.float32)
                        p2c = jnp.take_along_axis(
                            p2c, jnp.broadcast_to(p2c_idx[None, None],
                                                  (B, H, S, S)), axis=-1)
                        # gathered[j, i] → score[i, j] (HF transposes p2c)
                        logits = logits + jnp.swapaxes(p2c, -1, -2) * scale
                logits = logits + amask
                probs = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                                 preferred_element_type=jnp.float32)
            ctx = ctx.reshape(B, S, H * Dh)
        ctx = ctx.astype(compute_dtype)
        attn_out = jnp.einsum("bsd,de->bse", ctx, lp["o_w"].astype(compute_dtype),
                              preferred_element_type=jnp.float32) + lp["o_b"].astype(jnp.float32)
        # fused residual-add + LayerNorm: the f32 convert+reduce epilogues
        # around LN are ~46% of encoder step time (device trace); the Pallas
        # kernel does add → stats → normalize in one VMEM pass
        h = add_layer_norm(attn_out.astype(compute_dtype), x,
                           lp["attn_ln_scale"], lp["attn_ln_bias"],
                           cfg.layer_norm_eps, use_pallas=use_fused_ln)

        ff = jnp.einsum("bsd,df->bsf", h, lp["ffn_in_w"].astype(compute_dtype),
                        preferred_element_type=jnp.float32) + lp["ffn_in_b"].astype(jnp.float32)
        ff = jax.nn.gelu(ff, approximate=False).astype(compute_dtype)
        ff = jnp.einsum("bsf,fd->bsd", ff, lp["ffn_out_w"].astype(compute_dtype),
                        preferred_element_type=jnp.float32) + lp["ffn_out_b"].astype(jnp.float32)
        h = add_layer_norm(ff.astype(compute_dtype), h,
                           lp["ffn_ln_scale"], lp["ffn_ln_bias"],
                           cfg.layer_norm_eps, use_pallas=use_fused_ln)
        return h, None

    body = jax.checkpoint(layer_body) if remat else layer_body
    h, _ = jax.lax.scan(body, h, layers)
    return h.astype(jnp.float32)


def embed_texts_device(
    params: Dict[str, Any],
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: EncoderConfig,
    compute_dtype=jnp.bfloat16,
    use_flash: bool = False,
    pooling: str = "cls",
    attn_impl: Optional[str] = None,
) -> jax.Array:
    """Encoder forward + pool + L2 normalize → ``[B, D]`` float32.

    ``pooling="cls"`` mirrors the reference's ``_get_embeddings`` epilogue
    (classifier.py:1271-1282); ``"mean"`` is masked mean pooling — the right
    choice for MLM-only pretrained encoders (ac-tiny/ac-small), whose [CLS]
    state is never trained as a sentence summary.
    """
    hidden = encoder_forward(params, input_ids, attention_mask, cfg, compute_dtype,
                             use_flash=use_flash, attn_impl=attn_impl)
    if pooling == "mean":
        m = attention_mask[:, :, None].astype(hidden.dtype)
        pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    else:
        pooled = hidden[:, 0, :]
    pooled = pooled.astype(jnp.float32)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# HuggingFace checkpoint loading (local files only)
# ---------------------------------------------------------------------------

def _find_local_checkpoint(model_name: str) -> Optional[Path]:
    p = Path(model_name)
    if p.is_dir() and (p / "config.json").exists():
        return p
    cache = Path(os.environ.get("HF_HOME", Path.home() / ".cache" / "huggingface")) / "hub"
    repo_dir = cache / f"models--{model_name.replace('/', '--')}" / "snapshots"
    if repo_dir.exists():
        snaps = sorted(repo_dir.iterdir())
        for snap in reversed(snaps):
            if (snap / "config.json").exists():
                return snap
    return None


def _read_hf_config(path: Path) -> EncoderConfig:
    cfg = json.loads((path / "config.json").read_text())
    model_type = cfg.get("model_type") or ""
    if "modernbert" in model_type:
        return EncoderConfig(
            vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"], num_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 8192),
            type_vocab_size=0, layer_norm_eps=cfg.get("norm_eps", 1e-5),
            pad_token_id=cfg.get("pad_token_id", 0), arch="modernbert",
            global_attn_every_n_layers=cfg.get("global_attn_every_n_layers", 3),
            local_attention=cfg.get("local_attention", 128),
            global_rope_theta=cfg.get("global_rope_theta", 160000.0),
            local_rope_theta=cfg.get("local_rope_theta", 10000.0),
        )
    if model_type in ("roberta", "xlm-roberta", "camembert"):
        return EncoderConfig(
            vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"], num_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 514),
            type_vocab_size=cfg.get("type_vocab_size", 1),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            pad_token_id=cfg.get("pad_token_id", 1), arch="roberta",
        )
    if model_type == "mpnet":
        return EncoderConfig(
            vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"], num_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 514),
            type_vocab_size=0, layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            pad_token_id=cfg.get("pad_token_id", 1), arch="mpnet",
            relative_attn_buckets=cfg.get("relative_attention_num_buckets", 32),
            pooling=cfg.get("ac_pooling", "cls"),
        )
    if model_type == "deberta-v2":
        # covers DeBERTa-v2 AND v3 checkpoints (v3 ships model_type
        # "deberta-v2"); v1 ("deberta") uses a different in_proj layout and
        # is not supported — fail loudly like the other out-of-family archs
        hid = cfg["hidden_size"]
        if cfg.get("conv_kernel_size", 0) and cfg.get("conv_kernel_size", 0) > 0:
            raise ValueError(
                "DeBERTa-v2 checkpoints with a ConvLayer (conv_kernel_size>0,"
                " e.g. deberta-v2-xlarge) are not supported; the v3 family"
                " (conv-free) is")
        if cfg.get("relative_attention") and not cfg.get("share_att_key", False):
            raise ValueError(
                "DeBERTa relative attention without share_att_key is not"
                " supported (all published v2/v3 configs share the key)")
        max_rel = cfg.get("max_relative_positions", -1)
        if max_rel is None or max_rel < 1:
            max_rel = cfg.get("max_position_embeddings", 512)
        buckets = cfg.get("position_buckets") or 0
        span = (buckets if buckets > 0 else max_rel) if cfg.get("relative_attention") else 0
        pos_att = cfg.get("pos_att_type") or []
        if isinstance(pos_att, str):
            pos_att = [x.strip() for x in pos_att.lower().split("|") if x.strip()]
        norm_rel = "layer_norm" in str(cfg.get("norm_rel_ebd", "none")).lower()
        emb_size = cfg.get("embedding_size", hid) or hid
        return EncoderConfig(
            vocab_size=cfg["vocab_size"], hidden_size=hid,
            num_layers=cfg["num_hidden_layers"], num_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 512),
            type_vocab_size=cfg.get("type_vocab_size", 0),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-7),
            pad_token_id=cfg.get("pad_token_id", 0), arch="deberta",
            embedding_size=emb_size if emb_size != hid else 0,
            rel_att_span=span, rel_att_buckets=max(buckets, 0),
            rel_att_max_pos=max_rel,
            rel_pos_att="|".join(pos_att), rel_norm=norm_rel,
            position_biased_input=cfg.get("position_biased_input", True),
            pooling=cfg.get("ac_pooling", "cls"),
        )
    if model_type == "electra":
        hid = cfg["hidden_size"]
        return EncoderConfig(
            vocab_size=cfg["vocab_size"], hidden_size=hid,
            num_layers=cfg["num_hidden_layers"], num_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 512),
            type_vocab_size=cfg.get("type_vocab_size", 2),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
            pad_token_id=cfg.get("pad_token_id", 0), arch="electra",
            embedding_size=(cfg.get("embedding_size", hid)
                            if cfg.get("embedding_size", hid) != hid else 0),
            pooling=cfg.get("ac_pooling", "cls"),
        )
    arch = "distilbert" if "distilbert" in model_type else "bert"
    if arch == "distilbert":
        return EncoderConfig(
            vocab_size=cfg["vocab_size"], hidden_size=cfg["dim"],
            num_layers=cfg["n_layers"], num_heads=cfg["n_heads"],
            intermediate_size=cfg["hidden_dim"],
            max_position_embeddings=cfg.get("max_position_embeddings", 512),
            type_vocab_size=0, layer_norm_eps=1e-12,
            pad_token_id=cfg.get("pad_token_id", 0), arch="distilbert",
        )
    return EncoderConfig(
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"], num_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        max_position_embeddings=cfg.get("max_position_embeddings", 512),
        type_vocab_size=cfg.get("type_vocab_size", 2),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        pad_token_id=cfg.get("pad_token_id", 0), arch="bert",
        pooling=cfg.get("ac_pooling", "cls"),
        pool_layer=cfg.get("ac_pool_layer", 0),
    )


def _load_state_dict(path: Path) -> Dict[str, np.ndarray]:
    st = path / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file
        return load_file(str(st))
    pt = path / "pytorch_model.bin"
    if pt.exists():
        import torch
        sd = torch.load(str(pt), map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"No weights file in {path}")


def _map_hf_weights(sd: Dict[str, np.ndarray], cfg: EncoderConfig) -> Dict[str, Any]:
    """Map HF BERT/DistilBERT tensor names into the stacked-layer pytree."""
    if cfg.arch == "modernbert":
        from .modernbert import map_modernbert_weights

        return map_modernbert_weights(sd, cfg)
    # strip the model prefix if present
    prefixes = ("bert.", "distilbert.", "roberta.", "electra.", "mpnet.",
                "deberta.", "")
    def get(name: str) -> np.ndarray:
        for p in prefixes:
            if p + name in sd:
                return sd[p + name]
        raise KeyError(name)

    D = cfg.hidden_size
    if cfg.arch == "distilbert":
        emb = {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": np.zeros((1, D), np.float32),
            "ln_scale": get("embeddings.LayerNorm.weight"),
            "ln_bias": get("embeddings.LayerNorm.bias"),
        }
        names = {
            "q": "attention.q_lin", "k": "attention.k_lin", "v": "attention.v_lin",
            "o": "attention.out_lin", "attn_ln": "sa_layer_norm",
            "ffn_in": "ffn.lin1", "ffn_out": "ffn.lin2", "ffn_ln": "output_layer_norm",
        }
        layer_fmt = "transformer.layer.{i}.{n}"
    else:
        E = cfg.embedding_size or D
        emb = {
            "word": get("embeddings.word_embeddings.weight"),
            "position": (get("embeddings.position_embeddings.weight")
                         if cfg.arch != "deberta" or cfg.position_biased_input
                         else np.zeros((1, E), np.float32)),
            "token_type": (get("embeddings.token_type_embeddings.weight")
                           if cfg.type_vocab_size > 0
                           else np.zeros((1, E), np.float32)),
            "ln_scale": get("embeddings.LayerNorm.weight"),
            "ln_bias": get("embeddings.LayerNorm.bias"),
        }
        if E != D:
            if cfg.arch == "deberta":       # bias-free embed_proj
                emb["proj_w"] = get("embeddings.embed_proj.weight").T
            else:                           # ELECTRA embeddings_project
                emb["proj_w"] = get("embeddings_project.weight").T
                emb["proj_b"] = get("embeddings_project.bias")
        if cfg.relative_attn_buckets:       # MPNet shared relative bias
            emb["rel_bias"] = get("encoder.relative_attention_bias.weight")
        if cfg.rel_att_span:                # DeBERTa shared relative table
            emb["rel_emb"] = get("encoder.rel_embeddings.weight")
            if cfg.rel_norm:
                emb["rel_ln_scale"] = get("encoder.LayerNorm.weight")
                emb["rel_ln_bias"] = get("encoder.LayerNorm.bias")
        if cfg.arch == "deberta":
            names = {
                "q": "attention.self.query_proj", "k": "attention.self.key_proj",
                "v": "attention.self.value_proj", "o": "attention.output.dense",
                "attn_ln": "attention.output.LayerNorm",
                "ffn_in": "intermediate.dense", "ffn_out": "output.dense",
                "ffn_ln": "output.LayerNorm",
            }
        elif cfg.arch == "mpnet":
            names = {
                "q": "attention.attn.q", "k": "attention.attn.k",
                "v": "attention.attn.v", "o": "attention.attn.o",
                "attn_ln": "attention.LayerNorm",
                "ffn_in": "intermediate.dense", "ffn_out": "output.dense",
                "ffn_ln": "output.LayerNorm",
            }
        else:
            names = {
                "q": "attention.self.query", "k": "attention.self.key",
                "v": "attention.self.value", "o": "attention.output.dense",
                "attn_ln": "attention.output.LayerNorm",
                "ffn_in": "intermediate.dense", "ffn_out": "output.dense",
                "ffn_ln": "output.LayerNorm",
            }
        layer_fmt = "encoder.layer.{i}.{n}"

    def lget(i: int, n: str, suffix: str) -> np.ndarray:
        return get(layer_fmt.format(i=i, n=names[n]) + "." + suffix)

    L = cfg.num_layers
    layers: Dict[str, np.ndarray] = {}
    # torch Linear stores [out, in]; transpose to [in, out] for x @ W
    for key, ln in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "o")):
        layers[f"{key}_w"] = np.stack([lget(i, ln, "weight").T for i in range(L)])
        layers[f"{key}_b"] = np.stack([lget(i, ln, "bias") for i in range(L)])
    layers["attn_ln_scale"] = np.stack([lget(i, "attn_ln", "weight") for i in range(L)])
    layers["attn_ln_bias"] = np.stack([lget(i, "attn_ln", "bias") for i in range(L)])
    layers["ffn_in_w"] = np.stack([lget(i, "ffn_in", "weight").T for i in range(L)])
    layers["ffn_in_b"] = np.stack([lget(i, "ffn_in", "bias") for i in range(L)])
    layers["ffn_out_w"] = np.stack([lget(i, "ffn_out", "weight").T for i in range(L)])
    layers["ffn_out_b"] = np.stack([lget(i, "ffn_out", "bias") for i in range(L)])
    layers["ffn_ln_scale"] = np.stack([lget(i, "ffn_ln", "weight") for i in range(L)])
    layers["ffn_ln_bias"] = np.stack([lget(i, "ffn_ln", "bias") for i in range(L)])

    to_jnp = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    return {"embeddings": to_jnp(emb), "layers": to_jnp(layers)}


# ---------------------------------------------------------------------------
# Encoder facade
# ---------------------------------------------------------------------------

class Encoder:
    """Owns encoder params + tokenizer + the jitted embed function.

    ``Encoder(model_name)`` loads a local HF checkpoint when one exists,
    otherwise deterministically random-initializes the named architecture
    (offline mode) so every downstream component still runs end-to-end.
    """

    def __init__(self, model_name: str, compute_dtype: str = "bfloat16", seed: int = 0,
                 quantization: Optional[str] = None):
        from .tokenizer import WordPieceTokenizer

        self.model_name = model_name
        self.compute_dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.quantization = quantization
        ckpt = _find_local_checkpoint(model_name)
        if ckpt is not None:
            self.config = _read_hf_config(ckpt)
            self.params = _map_hf_weights(_load_state_dict(ckpt), self.config)
            # non-WordPiece tokenizer.json (ModernBERT's BPE, any checkpoint
            # shipping byte-level BPE) → Rust tokenizers runtime adapter;
            # returns None for WordPiece files, which stay first-party
            from .hf_tokenizer_adapter import try_load_hf_tokenizer

            self.tokenizer = try_load_hf_tokenizer(str(ckpt))
            if self.tokenizer is None:
                try:
                    self.tokenizer = WordPieceTokenizer.from_pretrained(str(ckpt))
                except FileNotFoundError:
                    self.tokenizer = WordPieceTokenizer.hermetic(self.config.vocab_size)
            self.pretrained = True
            logger.info(f"Loaded encoder weights from {ckpt}")
        else:
            self.config = config_for_model_name(model_name)
            # name-derived seed: same model name → same weights, always
            name_seed = (seed * 1000003 + (hash_name(model_name) % 65521)) & 0x7FFFFFFF
            self.params = init_params(name_seed, self.config)
            self.tokenizer = WordPieceTokenizer.hermetic(self.config.vocab_size)
            # hermetic vocab is smaller than the arch's — shrink the table
            V = self.tokenizer.vocab_size
            self.params["embeddings"]["word"] = self.params["embeddings"]["word"][:V]
            self.config = EncoderConfig(**{**self.config.__dict__, "vocab_size": V})
            self.pretrained = False
            logger.warning(
                f"No local checkpoint for '{model_name}'; using deterministic "
                f"random weights (offline mode)"
            )

        cfg = self.config
        cd = self.compute_dtype

        # int8 inference path (reference ModelConfig.quantization key):
        # weights quantized once; activations quantized per token on the fly.
        # "auto" resolves like the reference's use_onnx="auto" (ONNX iff CPU,
        # classifier.py:114-130): the accelerated path engages where it wins —
        # on TPU the fused int8 FFN kernel beats the bf16 forward 1.28×.
        if self.quantization == "auto":
            self.quantization = "int8" if jax.default_backend() == "tpu" else None
        self._build_embed()

    def _build_embed(self):
        """(Re)build the jitted embed closures from the CURRENT config,
        quantization mode, and params.  Called from __init__ and again by
        ``restore_params`` — the closures capture ``cfg``, so assigning
        ``self.config`` alone would leave a stale forward."""
        cfg = self.config
        cd = self.compute_dtype

        if self.quantization == "int8":
            # ELECTRA without an embedding projection is structurally BERT;
            # MPNet's relative bias and projected ELECTRA stay on the float
            # path (the int8 layer body takes only the [B,S] pad mask)
            int8_ok = (cfg.arch in ("bert", "distilbert", "roberta")
                       or (cfg.arch == "electra" and not cfg.embedding_size))
            if not int8_ok:
                logger.warning(
                    f"quantization='int8' is not supported for arch "
                    f"'{cfg.arch}'; falling back to the float path"
                )
                self.quantization = None
        if self.quantization == "int8":
            from .encoder_int8 import (
                embed_texts_device_int8, quantize_encoder_for_inference,
            )

            if "qkv_w.int8" not in self.params.get("layers", {}):
                self.params = jax.jit(quantize_encoder_for_inference)(self.params)

            @functools.partial(jax.jit, static_argnames=("attn_impl",))
            def _embed_q(params, input_ids, attention_mask, attn_impl="einsum"):
                return embed_texts_device_int8(params, input_ids, attention_mask,
                                               cfg, cd, pooling=cfg.pooling,
                                               attn_impl=attn_impl)

            self._embed_jit = _embed_q
            self._embed = lambda p, ids, mask: _embed_q(
                p, ids, mask, attn_impl=self._attn_impl(ids.shape[1]))
            return

        @functools.partial(jax.jit, static_argnames=("attn_impl",))
        def _embed(params, input_ids, attention_mask, attn_impl="einsum"):
            return embed_texts_device(params, input_ids, attention_mask, cfg, cd,
                                      attn_impl=attn_impl, pooling=cfg.pooling)

        self._embed_jit = _embed
        self._embed = lambda p, ids, mask: _embed(
            p, ids, mask, attn_impl=self._attn_impl(ids.shape[1])
        )

    def restore_params(self, params, config: Optional[EncoderConfig] = None,
                       tokenizer=None, pretrained: Optional[bool] = None):
        """Swap in restored params (and optionally config/tokenizer), then
        rebuild the jitted closures so the forward actually uses them.

        For an int8-mode encoder, float params are re-quantized; an already
        runtime-quantized tree (``qkv_w.int8`` present) is used as-is."""
        if config is not None:
            self.config = config
        if tokenizer is not None:
            self.tokenizer = tokenizer
        if pretrained is not None:
            self.pretrained = pretrained
        self.params = params
        self._build_embed()

    def _use_flash(self, seq_len: int) -> bool:
        return self._attn_impl(seq_len) == "flash"

    def _attn_impl(self, seq_len: int) -> str:
        """Attention implementation policy (overridable via AC_ATTN_IMPL).

        Measured on v5e, bert-base dims, end-to-end embed
        (scripts/ab_attention.py, round 3; full matrix in
        docs/architecture.md):

        - <1024 tokens on TPU → "fusedqkv" (ops/attention_qkv.py): all
          heads computed straight off the packed ``[B,S,3D]`` QKV tensor,
          no head-split layout copies.  Sweeps EVERY cell of the round-3
          A/B — B=256/S=64 int8 15.3 ms vs einsum 30.3 (1.99×);
          B=32/S=512 int8 17.6 vs einsum 30.0 / oneshot 25.6 (the round-3
          interim winner).  Whole-pair scores stay resident in VMEM, so
          the ceiling is S≈512 at bert-base dims.
        - ≥1024 on TPU → "flash" (online-softmax streaming; scores no
          longer fit VMEM — the ModernBERT 8k-window path).
        - CPU → "einsum" always (Pallas interpret mode is for tests).
        """
        import os

        forced = os.environ.get("AC_ATTN_IMPL")
        if forced:
            return forced
        if self.config.relative_attn_buckets:
            return "einsum"          # MPNet bias rides the additive mask
        if self.config.arch == "deberta":
            return "einsum"          # disentangled scores need the full path
        if jax.default_backend() != "tpu":
            return "einsum"
        if seq_len >= 1024:
            return "flash"
        dh = self.config.hidden_size // self.config.num_heads
        if dh > 128 or dh % 8 or seq_len % 8:
            return "einsum"          # outside the fusedqkv kernel envelope
        return "fusedqkv"

    @property
    def hidden_size(self) -> int:
        return self.config.hidden_size

    #: sequence-length buckets: short queries pay for 32 tokens, not 512
    SEQ_BUCKETS = (32, 64, 128, 256, 512)

    def embed(self, texts, max_length: int = 512) -> jax.Array:
        """Tokenize on host, embed on device → normalized ``[B, D]`` float32."""
        ids, mask = self.tokenizer(
            texts, max_length=max_length, pad_to_buckets=self.SEQ_BUCKETS
        )
        return self._embed(self.params, jnp.asarray(ids), jnp.asarray(mask))


def hash_name(s: str) -> int:
    """Stable string hash (Python's builtin hash is salted per-process)."""
    h = 2166136261
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h
