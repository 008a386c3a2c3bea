"""Fault-injection tests — the failure-handling subsystem (SURVEY.md §5).

The reference's failure handling is minimal (loader try/except → ValueError,
classifier.py:761-762; ONNX init falls back to torch, :69-81); round-1
review marked ours 'partial: no fault-injection tests'.  These inject real
faults — corrupted checkpoints, missing files, broken downloads, a worker
poisoned mid-stream, bad inputs — and pin the recovery behavior.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from adaptive_classifier_tpu import AdaptiveClassifier


@pytest.fixture()
def saved_clf(tiny_classifier_factory, tmp_path):
    clf = tiny_classifier_factory()
    clf.add_examples(["good stuff", "great work", "bad stuff", "awful work"],
                     ["pos", "pos", "neg", "neg"])
    out = tmp_path / "ckpt"
    clf.save(str(out))
    return clf, out


def test_corrupted_config_json_raises_cleanly(saved_clf):
    _, path = saved_clf
    (path / "config.json").write_text("{ not valid json !!!")
    with pytest.raises(Exception) as e:
        AdaptiveClassifier.load(str(path))
    assert "Expecting" in str(e.value) or "config" in str(e.value).lower()


def test_missing_tensors_file_raises(saved_clf):
    _, path = saved_clf
    (path / "model.safetensors").unlink()
    with pytest.raises(FileNotFoundError):
        AdaptiveClassifier.load(str(path))


def test_truncated_safetensors_raises(saved_clf):
    _, path = saved_clf
    data = (path / "model.safetensors").read_bytes()
    (path / "model.safetensors").write_bytes(data[: len(data) // 2])
    with pytest.raises(Exception):
        AdaptiveClassifier.load(str(path))


def test_corrupted_examples_json_raises(saved_clf):
    _, path = saved_clf
    (path / "examples.json").write_text("[1, 2, ")
    with pytest.raises(Exception):
        AdaptiveClassifier.load(str(path))


def test_from_pretrained_failing_download_is_valueerror():
    """Reference contract (classifier.py:761-762): any Hub failure surfaces
    as ValueError naming the model id."""
    def broken(repo_id, filename, **kw):
        raise ConnectionError("network down")

    with pytest.raises(ValueError) as e:
        AdaptiveClassifier.from_pretrained("org/unreachable", download_fn=broken)
    assert "org/unreachable" in str(e.value)


def test_partial_download_is_valueerror(saved_clf, tmp_path):
    """Download that delivers config.json but dies on tensors → ValueError,
    not a half-constructed classifier."""
    _, path = saved_clf
    cache = tmp_path / "cache"
    cache.mkdir()

    def flaky(repo_id, filename, **kw):
        if filename == "model.safetensors":
            raise TimeoutError("stalled")
        src = path / filename
        (cache / filename).write_bytes(src.read_bytes())
        return str(cache / filename)

    with pytest.raises(ValueError):
        AdaptiveClassifier.from_pretrained("org/flaky", download_fn=flaky)


def test_missing_encoder_checkpoint_falls_back_offline(saved_clf, tmp_path):
    """A checkpoint whose encoder is unavailable but whose ARCHITECTURE is
    known loads with deterministic offline weights instead of crashing (the
    encoder fallback the reference implements for ONNX init,
    classifier.py:69-81)."""
    _, path = saved_clf
    cfg = json.loads((path / "config.json").read_text())
    cfg["model_name"] = "someorg/nonexistent-tiny-model"  # dims resolvable
    (path / "config.json").write_text(json.dumps(cfg))
    clf = AdaptiveClassifier.load(str(path))
    assert clf.encoder.pretrained is False
    assert clf.predict("hello", k=1)  # still serves predictions


def test_incompatible_encoder_dim_is_clear_error(saved_clf):
    """If the unavailable encoder's dims can't be matched offline, the
    loader raises a CLEAR dimension-mismatch error, not a broadcast
    traceback from deep inside a restore."""
    _, path = saved_clf
    cfg = json.loads((path / "config.json").read_text())
    cfg["model_name"] = "someorg/totally-unknown-model"  # defaults to 768-d
    (path / "config.json").write_text(json.dumps(cfg))
    with pytest.raises(ValueError, match="dim"):
        AdaptiveClassifier.load(str(path))


def test_serving_worker_survives_poison_request(tiny_classifier_factory):
    """One request raising inside the worker fails ONLY its future; the
    worker keeps serving subsequent requests."""
    from adaptive_classifier_tpu.serving import BatchingClassifierServer

    clf = tiny_classifier_factory()
    clf.add_examples(["good stuff", "bad stuff"], ["pos", "neg"])
    server = BatchingClassifierServer(clf, max_batch_size=4, max_wait_ms=1)
    server.start()
    try:
        # poison: add_examples with mismatched lengths raises in-worker
        bad = server.submit_add_examples(["a", "b"], ["only-one-label"])
        with pytest.raises(Exception):
            bad.result(timeout=30)
        # the worker is still alive and serving
        good = server.submit_predict("good stuff", k=1)
        assert good.result(timeout=30)[0][0] in ("pos", "neg")
    finally:
        server.stop()


def test_bad_inputs_raise_valueerror(tiny_classifier_factory):
    """Reference input validation (classifier.py:140-149)."""
    clf = tiny_classifier_factory()
    with pytest.raises(ValueError):
        clf.add_examples([], [])
    with pytest.raises(ValueError):
        clf.add_examples(["a", "b"], ["x"])
    with pytest.raises(ValueError):
        clf.predict_batch([])


def test_wrong_dim_embedding_rejected(tiny_classifier_factory):
    from adaptive_classifier_tpu import Example
    from adaptive_classifier_tpu.memory import PrototypeMemory

    mem = PrototypeMemory(16)
    with pytest.raises(ValueError):
        mem.add_example(Example("t", "a", np.zeros(8, np.float32)), "a")
