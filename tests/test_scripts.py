"""Smoke tests for the eval/training scripts (reference analog: the scripts
tier is exercised by CI needing only synthetic fallbacks)."""

import runpy
import sys
from pathlib import Path

import pytest

pytestmark = [pytest.mark.integration, pytest.mark.slow]

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def run_script(name, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [name] + argv)
    runpy.run_path(str(SCRIPTS / name), run_name="__main__")


def test_eval_router(monkeypatch, capsys):
    run_script("eval_router.py", ["--model", "prajjwal1/bert-tiny"], monkeypatch)
    out = capsys.readouterr().out
    assert "accuracy" in out and "cost_savings_pct" in out


def test_eval_strategic_synthetic(monkeypatch, capsys):
    run_script(
        "eval_strategic.py",
        ["--model", "prajjwal1/bert-tiny", "--data", "synthetic"],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "robustness_drop" in out and "strategic" in out


def test_ab_pool_layer_sweep(monkeypatch, capsys, tmp_path):
    """Depth sweep runs end-to-end and reports every requested depth;
    pool_layer variants go through a real checkpoint-dir round trip
    (ac_pool_layer in config.json)."""
    out_file = tmp_path / "pool.json"
    run_script(
        "ab_pool_layer.py",
        ["--model", "checkpoints/ac-tiny", "--depths", "0,2",
         "--datasets", "spam", "--json-out", str(out_file)],
        monkeypatch,
    )
    import json as _json

    res = _json.loads(out_file.read_text())
    assert set(res) == {"0", "2"}
    for accs in res.values():
        assert 0.0 <= accs["spam"] <= 1.0
    out = capsys.readouterr().out
    assert "macro=" in out


def test_label_mapping_divergence_between_feed_patterns():
    """One-shot add_examples sorts the new labels; chunked feeding assigns
    ids in arrival order — two classifiers over the SAME data can therefore
    hold different label_to_id maps.  eval_strategic.py's gaming row once
    mixed the two mappings, flipping the regular row to exactly
    1 - accuracy on the 2-way set (round-3 fix: each row must build its
    label vector from its own classifier's mapping)."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    cfg = {"train_size_buckets": [64], "class_capacity_buckets": [8],
           "example_capacity_buckets": [32]}
    texts_pos = [f"great wonderful product number {i}" for i in range(4)]
    texts_neg = [f"terrible awful experience number {i}" for i in range(4)]

    oneshot = AdaptiveClassifier("prajjwal1/bert-tiny", config=cfg)
    oneshot.add_examples(texts_pos + texts_neg,
                         ["positive"] * 4 + ["negative"] * 4)

    chunked = AdaptiveClassifier("prajjwal1/bert-tiny", config=cfg)
    chunked.add_examples(texts_pos, ["positive"] * 4)
    chunked.add_examples(texts_neg, ["negative"] * 4)

    assert oneshot.label_to_id == {"negative": 0, "positive": 1}
    assert chunked.label_to_id == {"positive": 0, "negative": 1}


def test_real_datasets_load_and_are_wellformed():
    """The frozen real-text datasets parse and have the expected shapes."""
    import json

    data = Path(__file__).resolve().parent.parent / "data"
    sent = json.loads((data / "sentiment.json").read_text())
    assert len(sent["train"]["positive"]) >= 50
    assert len(sent["train"]["negative"]) >= 50
    assert len(sent["test"]["positive"]) >= 15
    intents = json.loads((data / "intents.json").read_text())
    assert len(intents["train"]) == 10 and len(intents["new_classes"]) == 3
    for label, rows in intents["test"].items():
        assert len(rows) >= 4, label
    router = json.loads((data / "router.json").read_text())
    assert {r["label"] for r in router["eval"]} == {"LOW", "HIGH"}
    assert any(not r["weak_ok"] for r in router["eval"])
    halluc = json.loads((data / "hallucination.json").read_text())
    labels = {d["label"] for d in halluc["train"]}
    assert labels == {"FAITHFUL", "HALLUCINATED"}
    # every text is real prose, not templated placeholders
    for t in (sent["train"]["positive"][:5] + [r["q"] for r in router["eval"][:5]]):
        assert len(t.split()) >= 4


def test_train_config_optimizer(monkeypatch, capsys, tmp_path):
    run_script(
        "train_config_optimizer.py",
        ["--model", "prajjwal1/bert-tiny", "--out", str(tmp_path / "opt")],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "accuracy" in out
    assert (tmp_path / "opt" / "config.json").exists()


def test_train_hallucination_detector(monkeypatch, capsys, tmp_path):
    run_script(
        "train_hallucination_detector.py",
        ["--model", "prajjwal1/bert-tiny", "--out", str(tmp_path / "h")],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "f1" in out
    assert (tmp_path / "h" / "model.safetensors").exists()


@pytest.mark.parametrize("example", ["basic_usage.py", "advanced_usage.py",
                                     "multilabel_usage.py",
                                     "production_serving.py",
                                     "finetune_usage.py"])
def test_examples_run(example, monkeypatch, tmp_path):
    """Examples execute end-to-end (small model via env override)."""
    monkeypatch.setenv("AC_TPU_EXAMPLE_MODEL", "prajjwal1/bert-tiny")
    monkeypatch.chdir(tmp_path)  # basic_usage saves ./demo_classifier
    examples_dir = Path(__file__).resolve().parent.parent / "examples"
    monkeypatch.setattr(sys, "argv", [example])
    runpy.run_path(str(examples_dir / example), run_name="__main__")
