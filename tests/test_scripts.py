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
                                     "multilabel_usage.py"])
def test_examples_run(example, monkeypatch, tmp_path):
    """Examples execute end-to-end (small model via env override)."""
    monkeypatch.setenv("AC_TPU_EXAMPLE_MODEL", "prajjwal1/bert-tiny")
    monkeypatch.chdir(tmp_path)  # basic_usage saves ./demo_classifier
    examples_dir = Path(__file__).resolve().parent.parent / "examples"
    monkeypatch.setattr(sys, "argv", [example])
    runpy.run_path(str(examples_dir / example), run_name="__main__")
