"""Save/load round-trip tests (reference analog: tests/test_classifier.py:57-122,
test_confidence_consistency.py, test_single_example_confidence.py)."""

import json
from pathlib import Path

import numpy as np
import pytest

from adaptive_classifier_tpu import AdaptiveClassifier


@pytest.fixture(scope="module")
def saved(tmp_path_factory, synth_classifier_factory):
    clf = synth_classifier_factory()
    texts = [f"pos:{i}" for i in range(12)] + [f"neg:{i}" for i in range(12)]
    labels = ["positive"] * 12 + ["negative"] * 12
    clf.add_examples(texts, labels)
    path = tmp_path_factory.mktemp("ckpt") / "model"
    clf.save(str(path))
    return clf, path


def _reload(path):
    from tests.conftest import synthetic_embed

    clf = AdaptiveClassifier.load(str(path))
    clf._get_embeddings = lambda texts: synthetic_embed(texts, dim=clf.embedding_dim)
    return clf


def test_save_file_set(saved):
    _, path = saved
    for fname in ("config.json", "examples.json", "model.safetensors", "README.md"):
        assert (path / fname).exists(), fname


def test_config_json_reference_format(saved):
    clf, path = saved
    cfg = json.loads((path / "config.json").read_text())
    assert cfg["model_name"] == "prajjwal1/bert-tiny"
    assert cfg["embedding_dim"] == 128
    assert cfg["label_to_id"] == {"negative": 0, "positive": 1}
    assert cfg["id_to_label"] == {"0": "negative", "1": "positive"}
    assert cfg["library_name"] == "adaptive-classifier"
    assert cfg["training_history"] == {"positive": 12, "negative": 12}
    assert "prototype_weight" in cfg["config"]


def test_examples_json_representative_count(saved):
    clf, path = saved
    data = json.loads((path / "examples.json").read_text())
    # num_representative_examples = 5 per class (classifier.py:559-566)
    assert set(data) == {"positive", "negative"}
    for label, exs in data.items():
        assert len(exs) == 5
        for ex in exs:
            assert ex["label"] == label
            assert len(ex["embedding"]) == 128


def test_safetensors_contents(saved):
    from safetensors.numpy import load_file

    clf, path = saved
    tensors = load_file(str(path / "model.safetensors"))
    assert "prototype_positive" in tensors
    assert tensors["prototype_positive"].shape == (128,)
    head_keys = [k for k in tensors if k.startswith("adaptive_head_")]
    assert "adaptive_head_model.0.weight" in head_keys
    # output layer trimmed to logical class count, torch [out, in] layout
    assert tensors["adaptive_head_model.6.weight"].shape[0] == 2


def test_roundtrip_prediction_consistency(saved):
    """Prediction drift across save/load < 5e-2 (reference
    test_classifier.py:57-122) — prototypes and head are exact, so the only
    drift source is the lossy example subset."""
    clf, path = saved
    clf2 = _reload(path)
    for q in ["pos:100", "neg:100", "pos:3"]:
        before = dict(clf.predict(q, k=2))
        after = dict(clf2.predict(q, k=2))
        assert set(before) == set(after)
        for label in before:
            assert abs(before[label] - after[label]) < 5e-2, (q, label)


def test_confidence_drift_below_001(saved):
    """Stricter drift bound from test_confidence_consistency.py:41-46 (<0.01):
    holds because prototypes and head tensors round-trip exactly."""
    clf, path = saved
    clf2 = _reload(path)
    for q in ["pos:7", "neg:7"]:
        before = dict(clf.predict(q, k=2))
        after = dict(clf2.predict(q, k=2))
        for label in before:
            assert abs(before[label] - after[label]) < 0.01


def test_offline_roundtrip_preserves_encoder_seed(tmp_path):
    """Offline-mode encoders derive their deterministic random weights from
    (seed, model_name).  A load that dropped the saved seed would rebuild a
    DIFFERENT embedding space than the prototypes live in — query texts
    would embed off-space and predictions would silently drift (found by
    round-3 verification; the synthetic-embed fixtures above masked it).
    The seed must round-trip via config.json's ac_seed."""
    cfg = {"train_size_buckets": [64], "class_capacity_buckets": [8],
           "example_capacity_buckets": [32], "embedding_cache_size": 0}
    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config=cfg, seed=7)
    clf.add_examples(
        ["alpha beta gamma", "delta epsilon zeta",
         "eta theta iota", "kappa lambda mu"],
        ["a", "a", "b", "b"])
    path = tmp_path / "ckpt"
    clf.save(str(path))
    clf2 = AdaptiveClassifier.load(str(path))
    assert clf2.seed == 7
    q = ["nu xi omicron"]
    e1, e2 = clf._get_embeddings(q), clf2._get_embeddings(q)
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    p1, p2 = clf.predict_batch(q, k=2), clf2.predict_batch(q, k=2)
    assert [l for l, _ in p1[0]] == [l for l, _ in p2[0]]
    for (_, s1), (_, s2) in zip(p1[0], p2[0]):
        assert abs(s1 - s2) < 1e-5


def test_training_history_persists(saved):
    clf, path = saved
    clf2 = _reload(path)
    assert clf2.training_history == clf.training_history
    assert clf2.train_steps == clf.train_steps


def test_training_history_backcompat_estimate(saved, tmp_path):
    """Missing training_history → estimated as saved_examples × 20
    (classifier.py:908-913)."""
    clf, path = saved
    import shutil

    legacy = tmp_path / "legacy"
    shutil.copytree(path, legacy)
    cfg = json.loads((legacy / "config.json").read_text())
    cfg["training_history"] = {}
    (legacy / "config.json").write_text(json.dumps(cfg))
    clf2 = AdaptiveClassifier.load(str(legacy))
    assert clf2.training_history == {"positive": 100, "negative": 100}


def test_continue_training_after_load(saved):
    clf, path = saved
    clf2 = _reload(path)
    clf2.add_examples([f"neu:{i}" for i in range(6)], ["neutral"] * 6)
    assert clf2.label_to_id["neutral"] == 2
    assert clf2.predict("neu:9", k=3)[0][0] == "neutral"


def test_num_representative_examples_honored(tmp_path, synth_classifier_factory):
    """Reference test_classifier.py:204-225."""
    clf = synth_classifier_factory(num_representative_examples=3)
    clf.add_examples([f"a:{i}" for i in range(10)], ["a"] * 10)
    p = tmp_path / "m"
    clf.save(str(p))
    data = json.loads((p / "examples.json").read_text())
    assert len(data["a"]) == 3
    clf2 = AdaptiveClassifier.load(str(p))
    assert len(clf2.memory.texts["a"]) == 3


def test_from_pretrained_local_dir(saved):
    clf, path = saved
    clf2 = AdaptiveClassifier.from_pretrained(str(path))
    assert clf2.label_to_id == clf.label_to_id


def test_from_pretrained_hub_path_with_injected_downloader(saved, tmp_path):
    """The Hub-download path (reference classifier.py:680-760) exercised
    offline via an injected downloader: files are 'fetched' one by one into
    a cache dir, and the classifier loads from there."""
    clf, path = saved
    cache = tmp_path / "hub_cache"
    cache.mkdir()
    fetched = []

    def fake_download(repo_id, filename, **kw):
        fetched.append((repo_id, filename))
        src = Path(path) / filename
        if not src.exists():
            raise FileNotFoundError(filename)
        dst = cache / filename
        dst.write_bytes(src.read_bytes())
        return str(dst)

    clf2 = AdaptiveClassifier.from_pretrained(
        "someorg/somerepo", download_fn=fake_download
    )
    assert clf2.label_to_id == clf.label_to_id
    assert ("someorg/somerepo", "config.json") in fetched
    assert ("someorg/somerepo", "model.safetensors") in fetched
    # a failing download surfaces as ValueError (reference classifier.py:761-762)
    def always_fail(repo_id, filename, **kw):
        raise ConnectionError("offline")

    with pytest.raises(ValueError):
        AdaptiveClassifier.from_pretrained("org/missing", download_fn=always_fail)
