"""Encoder-variant A/B harness (run manually on TPU).

The encoder is 100%% of end-to-end pipeline time (measured: encoder-only
6683 q/s == full pipeline 6693 q/s), so layer-body variants are where
throughput work happens.  See docs/ROADMAP.md.
"""
import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from adaptive_classifier_tpu.models.encoder import EncoderConfig, init_params_on_device, _layer_norm

cfg = EncoderConfig(vocab_size=30522)
params = init_params_on_device(0, cfg)
r = np.random.default_rng(0)
B, S = 256, 64
mask = jnp.ones((B, S), jnp.int32)
D, H, Dh, F = 768, 12, 64, 3072
scale = 1.0 / np.sqrt(Dh)
cd = jnp.bfloat16

# pre-concatenate qkv weights once (host-free: on device)
@jax.jit
def fuse_qkv(p):
    L = p["layers"]
    return {**p, "layers": {**L,
        "qkv_w": jnp.concatenate([L["q_w"], L["k_w"], L["v_w"]], axis=2),
        "qkv_b": jnp.concatenate([L["q_b"], L["k_b"], L["v_b"]], axis=1)}}
pf = fuse_qkv(params)

def fwd(p, ids, fused):
    emb = p["embeddings"]
    h = emb["word"][ids] + emb["position"][jnp.arange(S)][None] + emb["token_type"][0][None, None]
    h = _layer_norm(h, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps).astype(cd)
    amask = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    def body(h, lp):
        x = h
        if fused:
            qkv = (jnp.einsum("bsd,de->bse", x, lp["qkv_w"].astype(cd), preferred_element_type=jnp.float32)
                   + lp["qkv_b"].astype(jnp.float32)).astype(cd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            def proj(w, b):
                y = jnp.einsum("bsd,de->bse", x, w.astype(cd), preferred_element_type=jnp.float32)
                return (y + b.astype(jnp.float32)).astype(cd)
            q, k, v = proj(lp["q_w"], lp["q_b"]), proj(lp["k_w"], lp["k_b"]), proj(lp["v_w"], lp["v_b"])
        q = q.reshape(B, S, H, Dh); k = k.reshape(B, S, H, Dh); v = v.reshape(B, S, H, Dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale + amask
        probs = jax.nn.softmax(logits, -1).astype(cd)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32).reshape(B, S, D).astype(cd)
        a = jnp.einsum("bsd,de->bse", ctx, lp["o_w"].astype(cd), preferred_element_type=jnp.float32) + lp["o_b"].astype(jnp.float32)
        h = _layer_norm(a.astype(cd) + x, lp["attn_ln_scale"], lp["attn_ln_bias"], cfg.layer_norm_eps)
        ff = jnp.einsum("bsd,df->bsf", h, lp["ffn_in_w"].astype(cd), preferred_element_type=jnp.float32) + lp["ffn_in_b"].astype(jnp.float32)
        ff = jax.nn.gelu(ff, approximate=False).astype(cd)
        ff = jnp.einsum("bsf,fd->bsd", ff, lp["ffn_out_w"].astype(cd), preferred_element_type=jnp.float32) + lp["ffn_out_b"].astype(jnp.float32)
        h = _layer_norm(ff.astype(cd) + h, lp["ffn_ln_scale"], lp["ffn_ln_bias"], cfg.layer_norm_eps)
        return h, None
    h, _ = jax.lax.scan(body, h, p["layers"])
    cls = h[:, 0, :].astype(jnp.float32)
    return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12)

batches = [jnp.asarray(r.integers(0, 30000, (B, S)), jnp.int32) for _ in range(40)]
for fused, p in ((False, params), (True, pf)):
    @jax.jit
    def step(acc, p, ids, fused=fused):
        e = fwd(p, ids, fused)
        return acc + jnp.sum(e), e
    acc, e = step(jnp.zeros(()), p, batches[0]); np.asarray(e)
    acc = jnp.zeros(()); t0 = time.perf_counter()
    for i in range(40):
        acc, e = step(acc, p, batches[i])
    float(acc); dt = time.perf_counter() - t0
    print(f"fused={fused}: {B*40/dt:.0f} q/s ({dt/40*1000:.1f} ms/batch)")
