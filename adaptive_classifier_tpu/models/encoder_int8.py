"""Int8 encoder forward — the quantized inference path on the int8 MXU.

The reference's quantized story is INT8 dynamic-quantized ONNX for faster
CPU inference (reference classifier.py:1031-1107, "2-4× on x86").  The TPU
analog is real int8 matmul: v5e's MXU runs int8×int8→int32 at twice the bf16
rate, so the encoder's six big matmuls per layer run quantized —
per-output-channel int8 weights (the same scheme ``quantization.py``
exports) with dynamic per-row (per-token) int8 activation quantization,
float32 scale application fused into the epilogue, and the residual
stream/LayerNorm kept in higher precision.

Numerics: ``W·x ≈ (sw ⊗ sx) · (W_q · x_q)`` with symmetric scales; embedding
cosine vs the bf16 forward stays > 0.99 (tested), the same envelope the
reference accepts for its quantized ONNX models (test_onnx_phase2.py).

Measured on v5e (bert-base dims, B=256, S=64): int8 6478 seq/s vs bf16
6696 seq/s, cosine 0.9995 — XLA's int8 lowering plus the dynamic-quant
epilogues currently eat the int8 MXU gain, so bf16 stays the default fast
path and this path's value is 4× smaller weights in HBM.  A Pallas fused
weight-stationary int8 matmul kernel is the roadmap item that should
unlock the 2× (docs/ROADMAP.md).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import EncoderConfig, _layer_norm


def quantize_weight(w: jax.Array):
    """Per-output-channel symmetric int8: w [in, out] → (int8 [in, out],
    scale [out])."""
    absmax = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_encoder_for_inference(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every layer matmul weight; embeddings/norms stay float.

    Q/K/V are fused into ONE ``[L, D, 3D]`` tensor at quantization time
    (per-output-channel scales are per output column, so quantizing the
    concatenation is bit-identical to concatenating the per-matrix
    quantizations) — concatenating int8 slices inside the scan body cost
    ~L·D·3D int8 copies per forward because the scan-carried slices defeat
    XLA hoisting."""
    layers = params["layers"]
    out = {"embeddings": params["embeddings"], "layers": {}}
    w_qkv = jnp.concatenate(
        [layers["q_w"], layers["k_w"], layers["v_w"]], axis=2)  # [L, D, 3D]
    q, s = jax.vmap(quantize_weight)(w_qkv)
    out["layers"]["qkv_w.int8"] = q
    out["layers"]["qkv_w.scale"] = s
    out["layers"]["qkv_b"] = jnp.concatenate(
        [layers["q_b"], layers["k_b"], layers["v_b"]], axis=1)  # [L, 3D]
    for name in ("o_w", "ffn_in_w", "ffn_out_w"):
        q, s = jax.vmap(quantize_weight)(layers[name])
        out["layers"][f"{name}.int8"] = q
        out["layers"][f"{name}.scale"] = s
    for name, v in layers.items():
        if not name.endswith("_w") and name not in ("q_b", "k_b", "v_b"):
            out["layers"][name] = v
    return out


def _dyn_quant_rows(x: jax.Array):
    """Per-row symmetric int8 activation quantization: x [.., D] →
    (int8, row scale [.., 1])."""
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _q_matmul(x: jax.Array, w_q: jax.Array, w_scale: jax.Array, bias: jax.Array):
    """x [B,S,D] float → int8 dot → [B,S,out] float32."""
    x_q, x_scale = _dyn_quant_rows(x.astype(jnp.float32))
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=((((x_q.ndim - 1),), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * w_scale[None, None, :]
    return y + bias.astype(jnp.float32)


def encoder_forward_int8(
    qparams: Dict[str, Any],
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: EncoderConfig,
    compute_dtype=jnp.bfloat16,
    use_fused_ffn: Optional[bool] = None,
    attn_impl: str = "einsum",
    fuse_o_proj: Optional[bool] = None,
) -> jax.Array:
    """BERT-family forward with int8 matmuls → last_hidden_state (float32).

    On TPU the FFN block (2/3 of the FLOPs) runs as ONE fused Pallas kernel —
    int8 MXU matmuls with the [B·S, 4D] intermediate kept in VMEM and the
    residual+LayerNorm epilogue fused (ops/ffn_int8.py; measured 1.6× the
    XLA bf16 FFN at bert-base dims).  ``use_fused_ffn=None`` auto-enables on
    the TPU backend for batches of ≥256 rows.
    """
    B, S = input_ids.shape
    if use_fused_ffn is None:
        use_fused_ffn = (
            jax.default_backend() == "tpu" and B * S >= 256
            and cfg.hidden_size % 128 == 0 and cfg.intermediate_size % 128 == 0
        )
    if fuse_o_proj is None:
        # candidate round-5 default, pending the real-HW A/B: folding the
        # O-projection + both LayerNorms into the FFN kernel deletes four
        # [M, D] HBM round-trips per layer — the non-kernel 4.1 ms/forward
        # the round-4 trace attributed to XLA's o_proj lowering +
        # LN/requant fusions (the round-2 STANDALONE o_proj kernel lost to
        # XLA; this fuses it INTO the FFN program instead)
        fuse_o_proj = False
    if use_fused_ffn:
        from ..ops.ffn_int8 import attn_ffn_block_int8, ffn_block_int8
        from ..ops.matmul_int8 import quant_matmul_int8
    emb = qparams["embeddings"]
    h = emb["word"][input_ids]
    if cfg.arch == "roberta":
        # RoBERTa position ids (same as the float path, encoder.py:210-216):
        # pad positions read row pad_id, real tokens cumsum(mask) + pad_id
        pad = cfg.pad_token_id
        mask_i = (input_ids != pad).astype(jnp.int32)
        pos_ids = jnp.cumsum(mask_i, axis=1) * mask_i + pad
        h = h + emb["position"][pos_ids]
    else:
        h = h + emb["position"][jnp.arange(S)][None, :, :]
    if cfg.type_vocab_size > 0:
        h = h + emb["token_type"][0][None, None, :]
    h = _layer_norm(h, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
    h = h.astype(compute_dtype)

    neg = jnp.asarray(-1e9, jnp.float32)
    amask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
    H, Dh = cfg.num_heads, cfg.head_dim
    scale = 1.0 / np.sqrt(Dh)

    def layer_body(h, lp):
        x = h

        # fused QKV: ONE dynamic quantization of x and ONE [D, 3D] int8
        # matmul instead of three (the float path fuses QKV the same way,
        # encoder.py "fused QKV +2.7%"; int8 additionally saves two
        # per-row quantization passes over x).  The weights were fused at
        # quantization time — concatenating here would copy ~D·3D int8
        # per layer per forward (scan-carried slices defeat hoisting).
        w_qkv = lp["qkv_w.int8"]
        s_qkv = lp["qkv_w.scale"]
        b_qkv = lp["qkv_b"]
        D = cfg.hidden_size
        if use_fused_ffn:
            # weight-stationary Pallas projection (ops/matmul_int8.py):
            # quantized activations + int32 accumulator stay in VMEM
            qkv = quant_matmul_int8(
                x.reshape(B * S, D), w_qkv, s_qkv, b_qkv,
            ).reshape(B, S, 3 * D).astype(compute_dtype)
        else:
            qkv = _q_matmul(x, w_qkv, s_qkv, b_qkv).astype(compute_dtype)
        if attn_impl == "fusedqkv":
            # all-heads Pallas attention straight off the packed QKV tensor
            # (ops/attention_qkv.py): no [B,S,H,Dh] split in HBM, so none
            # of the ~10.8 ms/forward of layout copies the round-3 trace
            # attributed to the einsum region (docs/architecture.md MFU
            # table) ever happens
            from ..ops.attention_qkv import attention_from_qkv

            ctx = attention_from_qkv(
                qkv.reshape(B, S, 3 * D), attention_mask, H, Dh)
        else:
            q = qkv[..., :D].reshape(B, S, H, Dh)
            k = qkv[..., D:2 * D].reshape(B, S, H, Dh)
            v = qkv[..., 2 * D:].reshape(B, S, H, Dh)

            if attn_impl == "oneshot":
                from ..ops.flash_attention import oneshot_attention

                ctx = oneshot_attention(q, k, v, attention_mask)
            elif attn_impl == "flash":
                from ..ops.flash_attention import flash_attention

                ctx = flash_attention(q, k, v, attention_mask)
            else:
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                    preferred_element_type=jnp.float32) * scale
                probs = jax.nn.softmax(logits + amask,
                                       axis=-1).astype(compute_dtype)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                                 preferred_element_type=jnp.float32)
            ctx = ctx.reshape(B, S, H * Dh)
        if fuse_o_proj and use_fused_ffn:
            # whole post-attention layer body in ONE Pallas program:
            # O-projection, residual+LN, both FFN matmuls, final
            # residual+LN — the projection output, both norms, and the
            # [M, 4D] intermediate never touch HBM (ops/ffn_int8.py
            # attn_ffn_block_int8; round-5 MFU item)
            Dm = cfg.hidden_size
            h = attn_ffn_block_int8(
                ctx.reshape(B * S, Dm), x.reshape(B * S, Dm),
                lp["o_w.int8"], lp["o_w.scale"], lp["o_b"],
                lp["attn_ln_scale"], lp["attn_ln_bias"],
                lp["ffn_in_w.int8"], lp["ffn_in_w.scale"], lp["ffn_in_b"],
                lp["ffn_out_w.int8"], lp["ffn_out_w.scale"], lp["ffn_out_b"],
                lp["ffn_ln_scale"], lp["ffn_ln_bias"], cfg.layer_norm_eps,
            ).reshape(B, S, Dm)
            return h, None

        # O-projection on XLA's int8 lowering (the pre-round-5 path and
        # the non-Pallas fallback): a STANDALONE fused o_proj kernel
        # measured 2.28 ms vs XLA's 1.14 ms at bert-base dims in round 2 —
        # one [D, D] matmul + elementwise is XLA's best fusion case; the
        # round-5 win above fuses it INTO the FFN program instead
        attn_out = _q_matmul(ctx, lp["o_w.int8"], lp["o_w.scale"], lp["o_b"])
        h = _layer_norm(attn_out.astype(compute_dtype) + x,
                        lp["attn_ln_scale"], lp["attn_ln_bias"],
                        cfg.layer_norm_eps)

        if use_fused_ffn:
            Dm = cfg.hidden_size
            h = ffn_block_int8(
                h.reshape(B * S, Dm),
                lp["ffn_in_w.int8"], lp["ffn_in_w.scale"], lp["ffn_in_b"],
                lp["ffn_out_w.int8"], lp["ffn_out_w.scale"], lp["ffn_out_b"],
                lp["ffn_ln_scale"], lp["ffn_ln_bias"], cfg.layer_norm_eps,
            ).reshape(B, S, Dm)
        else:
            ff = _q_matmul(h, lp["ffn_in_w.int8"], lp["ffn_in_w.scale"], lp["ffn_in_b"])
            ff = jax.nn.gelu(ff, approximate=False)
            ff = _q_matmul(ff, lp["ffn_out_w.int8"], lp["ffn_out_w.scale"], lp["ffn_out_b"])
            h = _layer_norm(ff.astype(compute_dtype) + h,
                            lp["ffn_ln_scale"], lp["ffn_ln_bias"], cfg.layer_norm_eps)
        return h, None

    layers = qparams["layers"]
    if 0 < cfg.pool_layer < cfg.num_layers:
        # truncated-depth pooling (EncoderConfig.pool_layer): static slice,
        # mirrors the float path in encoder.py
        layers = jax.tree.map(lambda a: a[: cfg.pool_layer], layers)
    h, _ = jax.lax.scan(layer_body, h, layers)
    return h.astype(jnp.float32)


def embed_texts_device_int8(qparams, input_ids, attention_mask, cfg,
                            compute_dtype=jnp.bfloat16,
                            pooling: str = "cls",
                            attn_impl: str = "einsum",
                            fuse_o_proj: Optional[bool] = None) -> jax.Array:
    hidden = encoder_forward_int8(qparams, input_ids, attention_mask, cfg,
                                  compute_dtype, attn_impl=attn_impl,
                                  fuse_o_proj=fuse_o_proj)
    if pooling == "mean":
        m = attention_mask[:, :, None].astype(hidden.dtype)
        pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    else:
        pooled = hidden[:, 0, :]
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)
