"""Integration tier (reference analog:
tests/test_enterprise_classifiers_integration.py + docs/integration_tests.md).

The reference loads 17 published Hub models; offline CI instead builds an
ecosystem of classifiers end-to-end (train → save → reload → verify) and
applies the same checks: valid predictions, k-parameter consistency,
repeat stability, latency bound, exact class sets.  Real published models
can additionally be checked by pointing AC_TPU_INTEGRATION_MODELS at local
checkpoint directories.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from adaptive_classifier_tpu import AdaptiveClassifier
from tests.conftest import synthetic_embed

pytestmark = pytest.mark.integration


ECOSYSTEM = {
    "business-sentiment": (
        ["pos", "neg", "neutral"],
        {"pos": ["possim:good service", "possim:great quality"],
         "neg": ["negsim:terrible support", "negsim:awful experience"],
         "neutral": ["neusim:it is okay", "neusim:average product"]},
    ),
    "llm-router": (
        ["HIGH", "LOW"],
        {"HIGH": ["hard:prove the theorem", "hard:design a consensus protocol"],
         "LOW": ["easy:capital of france", "easy:convert units"]},
    ),
    "fraud-detection": (
        ["fraud", "legitimate"],
        {"fraud": ["fr:wire money now urgent", "fr:claim your prize"],
         "legitimate": ["ok:invoice for services", "ok:monthly statement"]},
    ),
}


@pytest.fixture(scope="module")
def ecosystem(tmp_path_factory):
    """Train + save + reload the classifier ecosystem once."""
    root = tmp_path_factory.mktemp("ecosystem")
    loaded = {}
    for name, (classes, data) in ECOSYSTEM.items():
        clf = AdaptiveClassifier("prajjwal1/bert-tiny", config={
            "train_size_buckets": [64], "class_capacity_buckets": [8],
            "example_capacity_buckets": [32],
        })
        clf._get_embeddings = lambda texts: synthetic_embed(texts, dim=clf.embedding_dim)
        texts, labels = [], []
        for label, exs in data.items():
            for e in exs:
                for i in range(4):
                    texts.append(f"{e} v{i}")
                    labels.append(label)
        clf.add_examples(texts, labels)
        clf.save(str(root / name))
        re = AdaptiveClassifier.load(str(root / name))
        re._get_embeddings = lambda t, _re=None: synthetic_embed(t, dim=128)
        loaded[name] = (re, classes, data)
    return loaded


def test_all_models_load_and_predict(ecosystem):
    for name, (clf, classes, data) in ecosystem.items():
        label = classes[0]
        query = list(data[label])[0] + " v99"
        preds = clf.predict(query, k=3)
        assert preds, name
        assert all(0.0 <= s <= 1.0 for _, s in preds)
        assert preds[0][0] in classes


def test_exact_class_sets(ecosystem):
    for name, (clf, classes, _) in ecosystem.items():
        assert sorted(clf.label_to_id) == sorted(classes), name


def test_k_parameter_consistency(ecosystem):
    """k=1 vs k=2 top prediction must agree (reference :265-299)."""
    for name, (clf, classes, data) in ecosystem.items():
        for label, exs in data.items():
            q = exs[0] + " v50"
            p1 = clf.predict(q, k=1)
            p2 = clf.predict(q, k=2)
            assert p1[0][0] == p2[0][0], (name, q)


def test_repeat_stability(ecosystem):
    for name, (clf, _, data) in ecosystem.items():
        q = next(iter(data.values()))[0] + " v7"
        runs = [clf.predict(q, k=2) for _ in range(3)]
        for r in runs[1:]:
            assert r[0][0] == runs[0][0][0]
            assert abs(r[0][1] - runs[0][0][1]) < 1e-6


def test_inference_latency_bound(ecosystem):
    """< 2 s per prediction (reference :326-346 CI bound)."""
    clf, _, data = next(iter(ecosystem.values()))
    q = next(iter(data.values()))[0] + " v1"
    clf.predict(q)  # warm
    t0 = time.perf_counter()
    clf.predict(q)
    assert time.perf_counter() - t0 < 2.0


def test_ecosystem_accuracy(ecosystem):
    """Every classifier classifies its own domain correctly after reload."""
    for name, (clf, classes, data) in ecosystem.items():
        correct = total = 0
        for label, exs in data.items():
            for e in exs:
                total += 1
                p = clf.predict(e + " v77", k=1)
                correct += bool(p and p[0][0] == label)
        assert correct / total >= 0.8, (name, correct / total)


def test_legacy_config_embedded_examples(tmp_path, ecosystem):
    """Old on-disk layout: examples inside config.json, no examples.json
    (reference scripts/adaptive_router/config.json; SURVEY.md §5)."""
    clf, classes, data = ecosystem["llm-router"]
    src = None
    # rebuild a legacy checkpoint from a fresh save
    legacy = tmp_path / "legacy"
    clf.save(str(legacy))
    cfg = json.loads((legacy / "config.json").read_text())
    cfg["examples"] = json.loads((legacy / "examples.json").read_text())
    (legacy / "config.json").write_text(json.dumps(cfg))
    (legacy / "examples.json").unlink()
    re = AdaptiveClassifier.load(str(legacy))
    assert sorted(re.label_to_id) == sorted(classes)
    assert re.get_memory_stats()["total_examples"] > 0


@pytest.mark.skipif(
    not os.environ.get("AC_TPU_INTEGRATION_MODELS"),
    reason="set AC_TPU_INTEGRATION_MODELS to a colon-separated list of local checkpoint dirs",
)
def test_published_models_from_env():
    for path in os.environ["AC_TPU_INTEGRATION_MODELS"].split(":"):
        clf = AdaptiveClassifier.load(path)
        assert len(clf.label_to_id) > 0
        preds = clf.predict("integration probe text", k=1)
        assert preds and 0.0 <= preds[0][1] <= 1.0


# ---------------------------------------------------------------------------
# committed zoo tier — trained-here classifiers with recorded accuracies
# (offline analog of the reference's 17-published-model integration suite,
# reference tests/test_enterprise_classifiers_integration.py:20-123)
# ---------------------------------------------------------------------------

ZOO = Path(__file__).resolve().parent.parent / "checkpoints" / "zoo"

zoo_required = pytest.mark.skipif(
    not (ZOO / "manifest.json").exists(),
    reason="classifier zoo not built (scripts/build_classifier_zoo.py)",
)


@pytest.fixture(scope="module")
def zoo_manifest():
    import json

    return json.loads((ZOO / "manifest.json").read_text())


@zoo_required
def test_zoo_models_load_and_meet_recorded_accuracy(zoo_manifest):
    """Every committed zoo classifier loads and reproduces its recorded
    accuracy (within 2pp slack for numeric drift) on its real-text test
    split — the reference's published-model accuracy contract."""
    import json

    from adaptive_classifier_tpu import AdaptiveClassifier

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from build_classifier_zoo import dataset_specs

    specs = dataset_specs()
    for name, meta in zoo_manifest["classifiers"].items():
        clf = AdaptiveClassifier.load(str(ZOO / name))
        assert sorted(clf.label_to_id) == meta["classes"], name
        test = specs[name]["test"]
        preds = clf.predict_batch([t for t, _ in test], k=1)
        acc = sum(1 for (t, l), p in zip(test, preds)
                  if p and p[0][0] == l) / len(test)
        # slack covers backend numeric drift (manifest built on TPU, CI runs
        # CPU): near-tie rows can flip — the reference accepts 0.05 score
        # drift across backends the same way (test_onnx_phase2.py:114-158)
        slack = max(0.05, 2.0 / meta["n_test"])
        assert acc >= meta["expected_accuracy"] - slack, (name, acc, meta)


@zoo_required
def test_zoo_k_consistency_and_stability(zoo_manifest):
    """k=1 vs k=2 top prediction agrees; repeat predictions stable
    (reference :265-299, :326-346)."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    for name in zoo_manifest["classifiers"]:
        clf = AdaptiveClassifier.load(str(ZOO / name))
        text = "please check this request and route it correctly"
        top1 = clf.predict(text, k=1)[0][0]
        top2 = clf.predict(text, k=2)[0][0]
        assert top1 == top2, name
        again = clf.predict(text, k=1)[0][0]
        assert again == top1, name
