"""MLM pretraining module tests (CPU): masking recipe, HF export inverse,
and a convergence smoke test of the jitted step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptive_classifier_tpu import pretrain, training
from adaptive_classifier_tpu.models.encoder import (
    EncoderConfig, _map_hf_weights, init_params,
)

CFG = EncoderConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, max_position_embeddings=32)


def test_masking_recipe_statistics():
    """BERT recipe: ~15% of eligible positions selected; of those ~80%
    become [MASK], ~10% random, ~10% unchanged; specials never selected."""
    key = jax.random.PRNGKey(0)
    B, S = 64, 32
    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(4, 64, (B, S)), jnp.int32)
    ids = ids.at[:, 0].set(2)  # [CLS]
    mask = jnp.ones((B, S), jnp.int32)
    masked, targets, sel = pretrain.apply_mlm_masking(
        key, ids, mask, mask_id=4, vocab_size=64)
    sel = np.asarray(sel)
    masked = np.asarray(masked)
    ids_np = np.asarray(ids)
    assert not sel[:, 0].any()                       # [CLS] never masked
    np.testing.assert_array_equal(np.asarray(targets), ids_np)
    frac = sel.mean()
    assert 0.10 < frac < 0.20, frac
    changed_to_mask = (masked == 4) & sel
    kept = (masked == ids_np) & sel
    n_sel = sel.sum()
    assert 0.7 < changed_to_mask.sum() / n_sel < 0.9
    assert 0.03 < kept.sum() / n_sel < 0.2
    # unselected positions never change
    np.testing.assert_array_equal(masked[~sel], ids_np[~sel])


def test_hf_export_roundtrips_through_weight_mapping():
    """to_hf_state_dict is the exact inverse of encoder._map_hf_weights."""
    params = init_params(3, CFG)
    sd = pretrain.to_hf_state_dict(params, CFG)
    back = _map_hf_weights(sd, CFG)
    for section in ("embeddings", "layers"):
        for name, val in params[section].items():
            np.testing.assert_allclose(
                np.asarray(back[section][name]), np.asarray(val),
                atol=1e-6, err_msg=f"{section}.{name}")


def test_train_step_reduces_loss():
    """A few hundred jitted MLM steps on a tiny synthetic corpus reduce the
    loss well below the uniform baseline ln(V)."""
    r = np.random.default_rng(1)
    # structured corpus: token t is always followed by (t+1) mod 60 + 4
    rows = []
    for _ in range(64):
        start = int(r.integers(4, 60))
        rows.append([(start + j) % 60 + 4 for j in range(16)])
    ids = jnp.asarray(rows, jnp.int32)
    attn = jnp.ones_like(ids)

    params = pretrain.init_params(0, CFG)
    mlm = pretrain.init_mlm(0, CFG)
    opt = training.adamw_init({"enc": params, "mlm": mlm})
    key = jax.random.PRNGKey(0)
    first = None
    for step in range(700):
        key, sub = jax.random.split(key)
        params, mlm, opt, loss = pretrain.train_step_sampled(
            params, mlm, opt, ids, attn, sub, CFG, mask_id=4, batch=32,
            lr_peak=3e-3, warmup=20, total_steps=700)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert final < first * 0.6, (first, final)
    assert final < 2.2, final  # sequences are deterministic → learnable


def test_save_checkpoint_loads_in_encoder(tmp_path):
    from adaptive_classifier_tpu.models.encoder import Encoder

    params = init_params(1, CFG)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(59)]
    out = pretrain.save_hf_checkpoint(params, CFG, tmp_path / "ck", vocab)
    enc = Encoder(str(out))
    assert enc.pretrained
    assert enc.config.hidden_size == CFG.hidden_size
    e = enc.embed(["tok1 tok2 tok3"])
    assert np.isfinite(np.asarray(e)).all()


def test_safetensors_transposed_view_roundtrip(tmp_path):
    """Checkpoint params must survive the FILE round-trip bit-exactly.

    Regression: safetensors' numpy writer serializes the underlying buffer
    of a non-contiguous view (e.g. ``w.T``) with the view's shape metadata —
    every transposed weight written by an exporter that forgets
    ``ascontiguousarray`` loads back silently transposed.  The in-memory
    roundtrip test above cannot catch this; only the file path does."""
    from adaptive_classifier_tpu.models.encoder import Encoder

    params = init_params(5, CFG)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(59)]
    out = pretrain.save_hf_checkpoint(params, CFG, tmp_path / "ck", vocab)
    enc = Encoder(str(out))
    for section in ("embeddings", "layers"):
        for name, val in params[section].items():
            np.testing.assert_allclose(
                np.asarray(enc.params[section][name]), np.asarray(val),
                atol=1e-6, err_msg=f"{section}.{name}")
