"""Encoder fine-tuning (finetune.py + classifier.finetune_encoder).

Beyond-reference capability (the reference's encoder is frozen forever,
reference classifier.py:58-85): supervised-contrastive adaptation of the
encoder to the classifier's stored examples.  These tests run the real
jitted SupCon chunk on the virtual CPU mesh with a tiny hermetic encoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_classifier_tpu import AdaptiveClassifier, finetune, training
from adaptive_classifier_tpu.models.encoder import EncoderConfig, init_params


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = EncoderConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=32)
    params = init_params(0, cfg)
    rng = np.random.default_rng(3)
    # two token "registers": class 0 draws from ids 5..34, class 1 from 35..63
    N, S = 24, 16
    ids = np.zeros((N, S), np.int32)
    labels = np.asarray([i % 2 for i in range(N)], np.int32)
    for i in range(N):
        lo, hi = (5, 35) if labels[i] == 0 else (35, 64)
        ids[i] = rng.integers(lo, hi, S)
    ids[:, 0] = 2  # [CLS]
    attn = np.ones((N, S), np.int32)
    return cfg, params, jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(labels)


class TestSupconLoss:
    def test_finite_and_positive(self, tiny_setup):
        cfg, params, ids, attn, labels = tiny_setup
        loss = finetune.supcon_loss(params, ids, attn, labels,
                                    jax.random.PRNGKey(0), cfg, mask_id=4)
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_separated_embeddings_give_lower_loss(self, tiny_setup):
        """A batch where same-label rows are identical tokens (max positive
        similarity) must score lower than one with shuffled labels."""
        cfg, params, ids, attn, labels = tiny_setup
        loss_true = finetune.supcon_loss(
            params, ids, attn, labels, jax.random.PRNGKey(1), cfg,
            mask_id=4, view_mask_prob=0.0)
        # mispartitioned: first-half/second-half labels group rows across
        # both token registers, so positives straddle registers
        n = labels.shape[0]
        mixed = jnp.asarray(np.arange(n) < n // 2, jnp.int32)
        loss_mixed = finetune.supcon_loss(
            params, ids, attn, mixed, jax.random.PRNGKey(1), cfg,
            mask_id=4, view_mask_prob=0.0)
        # with an untrained encoder the gap is small but the ordering must
        # hold: matching labels to token registers is the easier problem
        assert np.isfinite(float(loss_mixed))
        assert float(loss_true) < float(loss_mixed)

    def test_chunk_reduces_loss(self, tiny_setup):
        cfg, params, ids, attn, labels = tiny_setup
        opt = training.adamw_init(params)
        before = float(finetune.supcon_loss(
            params, ids, attn, labels, jax.random.PRNGKey(5), cfg, mask_id=4,
            view_mask_prob=0.0))
        new_params, _, _ = finetune.supcon_chunk(
            params, opt, ids, attn, labels, jax.random.PRNGKey(6), cfg,
            mask_id=4, batch=16, n_steps=30, lr=1e-3, view_mask_prob=0.0)
        after = float(finetune.supcon_loss(
            new_params, ids, attn, labels, jax.random.PRNGKey(5), cfg,
            mask_id=4, view_mask_prob=0.0))
        assert after < before

    def test_improves_class_separation(self, tiny_setup):
        """After training, same-label pairs must be more similar than
        different-label pairs (the geometry the prototype memory needs)."""
        from adaptive_classifier_tpu.pretrain import _mean_pool_embed

        cfg, params, ids, attn, labels = tiny_setup
        opt = training.adamw_init(params)
        new_params, _, _ = finetune.supcon_chunk(
            params, opt, ids, attn, labels, jax.random.PRNGKey(7), cfg,
            mask_id=4, batch=16, n_steps=60, lr=1e-3, view_mask_prob=0.0)
        e = np.asarray(_mean_pool_embed(new_params, ids, attn, cfg))
        y = np.asarray(labels)
        sims = e @ e.T
        same = sims[y[:, None] == y[None, :]].mean()
        diff = sims[y[:, None] != y[None, :]].mean()
        assert same - diff > 0.2


class TestClassifierFinetune:
    def _make(self, **config):
        cfg = {
            "train_size_buckets": [64],
            "class_capacity_buckets": [8],
            "example_capacity_buckets": [32],
            **config,
        }
        return AdaptiveClassifier("prajjwal1/bert-tiny", config=cfg)

    def test_end_to_end(self):
        clf = self._make()
        texts = [f"the billing charge looks wrong case {i}" for i in range(6)] + \
                [f"please reset my account password now {i}" for i in range(6)]
        labels = ["billing"] * 6 + ["password"] * 6
        clf.add_examples(texts, labels)
        old_word = np.asarray(clf.encoder.params["embeddings"]["word"]).copy()
        old_protos = {l: v.copy() for l, v in clf.memory.prototypes.items()}

        report = clf.finetune_encoder(steps=20, chunk_steps=10, batch=8,
                                      lr=1e-4)
        assert report["steps"] == 20
        assert len(report["chunk_losses"]) == 2
        assert np.isfinite(report["final_loss"])
        # params actually moved
        new_word = np.asarray(clf.encoder.params["embeddings"]["word"])
        assert not np.allclose(old_word, new_word)
        # memory was re-embedded: prototypes moved with the encoder
        for l, p in clf.memory.prototypes.items():
            assert not np.allclose(old_protos[l], p), l
        # predictions still work over the full label set
        preds = clf.predict("the charge on my bill is wrong", k=2)
        assert len(preds) == 2
        assert {p[0] for p in preds} == {"billing", "password"}

    def test_reembed_keeps_slots_and_counts(self):
        clf = self._make()
        clf.add_examples(["pay my invoice", "update billing info",
                          "reset password", "login locked out"],
                         ["billing", "billing", "password", "password"])
        slots_before = dict(clf.memory.label_to_index)
        counts_before = {l: len(ts) for l, ts in clf.memory.texts.items()}
        clf.finetune_encoder(steps=10, chunk_steps=10, batch=4)
        assert clf.memory.label_to_index == slots_before
        assert {l: len(ts) for l, ts in clf.memory.texts.items()} == counts_before
        # device counts match host text lists
        cnt = np.asarray(clf.memory.state.count)
        for l, slot in slots_before.items():
            assert cnt[slot] == counts_before[l]

    def test_finetuned_weights_survive_save_load(self, tmp_path):
        """save() must persist the adapted encoder (encoder/ subdir) and
        load() must restore it — otherwise the adaptation silently reverts
        to the base model_name weights."""
        clf = self._make(embedding_cache_size=0)
        clf.add_examples(["refund the charge", "billing dispute case",
                          "forgot my password", "cannot sign in"],
                         ["billing", "password", "password", "password"])
        clf.finetune_encoder(steps=10, chunk_steps=10, batch=4, lr=1e-4)
        word_ft = np.asarray(clf.encoder.params["embeddings"]["word"])
        emb_ft = clf._get_embeddings(["refund the charge"])

        out = tmp_path / "ckpt"
        clf.save(str(out))
        assert (out / "encoder" / "model.safetensors").exists()

        clf2 = AdaptiveClassifier.load(str(out))
        assert getattr(clf2.encoder, "_finetuned", False)
        assert clf2.model_name == clf.model_name  # base identity kept
        word_loaded = np.asarray(clf2.encoder.params["embeddings"]["word"])
        np.testing.assert_allclose(word_ft, word_loaded, atol=1e-6)
        emb_loaded = clf2._get_embeddings(["refund the charge"])
        np.testing.assert_allclose(emb_ft, emb_loaded, atol=1e-5)
        # second-generation save keeps persisting the adapted encoder
        out2 = tmp_path / "ckpt2"
        clf2.save(str(out2))
        assert (out2 / "encoder" / "model.safetensors").exists()

    def test_hub_path_fetches_finetuned_encoder(self, tmp_path):
        """from_pretrained with an injected downloader must fetch the
        encoder/ subdir so a Hub round-trip keeps the adapted weights
        (without it, load silently rebuilds the base encoder while the
        prototypes/head live in the fine-tuned space)."""
        clf = self._make(embedding_cache_size=0)
        clf.add_examples(["billing question", "password reset"],
                         ["billing", "password"])
        clf.finetune_encoder(steps=10, chunk_steps=10, batch=4)
        src = tmp_path / "repo"
        clf.save(str(src))
        cache = tmp_path / "hub_cache"

        def fake_download(repo_id, filename, **kw):
            f = src / filename
            if not f.exists():
                raise FileNotFoundError(filename)
            dst = cache / filename
            dst.parent.mkdir(parents=True, exist_ok=True)
            dst.write_bytes(f.read_bytes())
            return str(dst)

        clf2 = AdaptiveClassifier.from_pretrained(
            "org/ft-model", download_fn=fake_download)
        assert getattr(clf2.encoder, "_finetuned", False)
        np.testing.assert_allclose(
            np.asarray(clf.encoder.params["embeddings"]["word"]),
            np.asarray(clf2.encoder.params["embeddings"]["word"]), atol=1e-6)

    def test_typo_augment(self):
        import random

        texts = ["the billing charge is wrong", "reset my password now"]
        labels = ["billing", "password"]
        out_t, out_l = finetune.typo_augment(texts, labels,
                                             random.Random(0), copies=2)
        assert len(out_t) == 6 and len(out_l) == 6
        assert out_t[:2] == texts and out_l == labels * 3
        # corrupted copies keep word count and only swap inner characters
        for orig, cor in zip(texts * 2, out_t[2:]):
            ow, cw = orig.split(), cor.split()
            assert len(ow) == len(cw)
            for a, b in zip(ow, cw):
                assert sorted(a) == sorted(b)  # same letters, maybe swapped

    def test_augment_end_to_end(self):
        clf = self._make()
        clf.add_examples(["the invoice total is wrong today",
                          "please reset my account password"],
                         ["billing", "password"])
        rep = clf.finetune_encoder(steps=10, chunk_steps=10, batch=4,
                                   augment="typo")
        assert np.isfinite(rep["final_loss"])
        with pytest.raises(ValueError, match="unknown augment"):
            clf.finetune_encoder(steps=10, augment="nope")

    def test_rejects_nonpositive_steps(self):
        clf = self._make()
        clf.add_examples(["a"], ["x"])
        with pytest.raises(ValueError, match="positive"):
            clf.finetune_encoder(steps=0)

    def test_resets_temperature_scaler(self):
        clf = self._make()
        clf.add_examples(["billing one", "billing two", "password one",
                          "password two"],
                         ["billing", "billing", "password", "password"])
        clf.calibrate(["billing three", "password three"],
                      ["billing", "password"])
        assert clf._temperature_scaler is not None
        clf.finetune_encoder(steps=10, chunk_steps=10, batch=4)
        assert clf._temperature_scaler is None

    def test_requires_examples(self):
        clf = self._make()
        with pytest.raises(ValueError, match="no stored examples"):
            clf.finetune_encoder(steps=10)

    def test_multilabel_shared_label_positive(self):
        """Multi-hot SupCon: rows sharing ≥1 label are positives — a text
        under {a,b} must NOT be pushed away from a text under {b,c}."""
        from adaptive_classifier_tpu.finetune import supcon_loss_multihot
        from adaptive_classifier_tpu.models.encoder import (
            EncoderConfig, init_params)

        cfg = EncoderConfig(vocab_size=64, hidden_size=32, num_layers=1,
                            num_heads=2, intermediate_size=64,
                            max_position_embeddings=16)
        params = init_params(0, cfg)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(5, 64, (8, 12)), jnp.int32)
        attn = jnp.ones((8, 12), jnp.int32)
        # overlapping label sets across all rows
        y = jnp.asarray(np.asarray(
            [[1, 1, 0], [0, 1, 1], [1, 0, 0], [0, 0, 1]] * 2, np.float32))
        loss = supcon_loss_multihot(params, ids, attn, y,
                                    jax.random.PRNGKey(0), cfg, mask_id=4)
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_multilabel_end_to_end(self):
        from adaptive_classifier_tpu import MultiLabelAdaptiveClassifier

        clf = MultiLabelAdaptiveClassifier("prajjwal1/bert-tiny", config={
            "train_size_buckets": [64], "class_capacity_buckets": [8],
            "example_capacity_buckets": [32],
        })
        clf.add_examples(
            ["urgent billing problem with my card",
             "urgent access issue cannot log in",
             "billing statement question",
             "login page not loading"],
            [["urgent", "billing"], ["urgent", "access"],
             ["billing"], ["access"]],
        )
        old_word = np.asarray(clf.encoder.params["embeddings"]["word"]).copy()
        rep = clf.finetune_encoder(steps=10, chunk_steps=10, batch=4)
        assert np.isfinite(rep["final_loss"])
        assert not np.allclose(
            old_word, np.asarray(clf.encoder.params["embeddings"]["word"]))
        preds = clf.predict_multilabel("urgent charge on my bill")
        assert isinstance(preds, list)
        # typo augment path also runs
        rep2 = clf.finetune_encoder(steps=10, chunk_steps=10, batch=4,
                                    augment="typo")
        assert np.isfinite(rep2["final_loss"])

    def test_merge_reembeds_across_finetuned_spaces(self):
        """merge_classifiers with a fine-tuned source must re-embed the
        source's texts with the TARGET encoder — raw rows from a different
        embedding space would corrupt the merged prototypes."""
        src = self._make(embedding_cache_size=0)
        src.add_examples(["ship my parcel today", "where is my delivery"],
                         ["shipping", "shipping"])
        src.finetune_encoder(steps=10, chunk_steps=10, batch=4, lr=1e-4)

        dst = self._make(embedding_cache_size=0)
        dst.add_examples(["refund the charge", "wrong bill amount"],
                         ["billing", "billing"])
        dst.merge_classifiers(src)
        # merged prototype must equal the mean of DST-encoder embeddings of
        # the source texts (i.e. texts were re-embedded, not copied)
        want = dst._get_embeddings(["ship my parcel today",
                                    "where is my delivery"]).mean(axis=0)
        got = dst.memory.prototypes["shipping"]
        cos = float(np.dot(want, got) /
                    (np.linalg.norm(want) * np.linalg.norm(got)))
        assert cos > 0.999, cos
        preds = dst.predict("track my delivery status", k=2)
        assert len(preds) == 2

    def test_int8_guard(self):
        clf = self._make(quantization="int8")
        if clf.encoder.quantization != "int8":  # CPU resolves 'auto' off only
            pytest.skip("int8 path not engaged on this backend")
        clf.add_examples(["a", "b"], ["x", "y"])
        with pytest.raises(ValueError, match="float encoder params"):
            clf.finetune_encoder(steps=10)
