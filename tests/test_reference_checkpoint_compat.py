"""Load checkpoints written exactly the way the torch reference writes them.

Constructs the file set with torch tensors + ``safetensors.torch`` and the
reference's exact config/examples layouts (classifier.py:524-628), then
loads through our persistence layer: label maps, prototypes, head weights,
and predictions must all come through.  (The reverse direction — our save
loading in the reference — uses the same file set; the reference library
itself can't run here because faiss isn't installable offline.)
"""

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from adaptive_classifier_tpu import AdaptiveClassifier

DIM = 128


def write_reference_style_checkpoint(path: Path, n_classes=3, n_examples=4):
    """Emulate the reference's _save_pretrained output byte-for-byte in
    structure: torch-saved safetensors, Sequential-indexed head tensors,
    reference config keys only."""
    from safetensors.torch import save_file

    labels = [f"class_{i}" for i in range(n_classes)]
    r = np.random.default_rng(0)

    config = {
        "model_name": "prajjwal1/bert-tiny",
        "embedding_dim": DIM,
        "label_to_id": {l: i for i, l in enumerate(labels)},
        "id_to_label": {str(i): l for i, l in enumerate(labels)},
        "train_steps": 7,
        "training_history": {l: 25 for l in labels},
        "config": {  # reference ModelConfig.to_dict() keys only
            "max_length": 512, "batch_size": 32, "learning_rate": 0.001,
            "warmup_steps": 0, "max_examples_per_class": 1000,
            "prototype_update_frequency": 100, "similarity_threshold": 0.6,
            "ewc_lambda": 100.0, "num_representative_examples": 5,
            "epochs": 10, "early_stopping_patience": 3,
            "min_examples_per_class": 3, "prototype_weight": 0.7,
            "neural_weight": 0.3, "min_confidence": 0.1, "device_map": "auto",
            "quantization": None, "gradient_checkpointing": False,
            "enable_strategic_mode": False, "cost_function_type": "separable",
            "strategic_lambda": 0.1, "cost_coefficients": {},
            "strategic_training_frequency": 10,
            "strategic_blend_regular_weight": 0.6,
            "strategic_blend_strategic_weight": 0.4,
            "strategic_robust_proto_weight": 0.8,
            "strategic_robust_head_weight": 0.2,
            "strategic_prediction_proto_weight": 0.5,
            "strategic_prediction_head_weight": 0.5,
        },
        "library_name": "adaptive-classifier",
    }

    examples = {}
    protos = {}
    for li, label in enumerate(labels):
        embs = r.standard_normal((n_examples, DIM)).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        examples[label] = [
            {"text": f"{label} example {j}", "label": label,
             "embedding": embs[j].tolist()}
            for j in range(n_examples)
        ]
        protos[label] = embs.mean(0)

    # torch head in the reference layout: Sequential indices 0, 3, 6
    torch.manual_seed(42)
    head = torch.nn.Sequential(
        torch.nn.Linear(DIM, DIM), torch.nn.ReLU(), torch.nn.Dropout(0.1),
        torch.nn.Linear(DIM, DIM // 2), torch.nn.ReLU(), torch.nn.Dropout(0.1),
        torch.nn.Linear(DIM // 2, n_classes),
    )
    tensors = {f"prototype_{l}": torch.tensor(p) for l, p in protos.items()}
    for name, param in head.state_dict().items():
        tensors[f"adaptive_head_model.{name}"] = param

    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps(config, indent=2, sort_keys=True))
    (path / "examples.json").write_text(json.dumps(examples, indent=2, sort_keys=True))
    save_file(tensors, str(path / "model.safetensors"))
    (path / "README.md").write_text("# model card\n")
    return labels, protos, head


def test_reference_checkpoint_loads(tmp_path):
    labels, protos, head = write_reference_style_checkpoint(tmp_path / "ref")
    clf = AdaptiveClassifier.load(str(tmp_path / "ref"))

    assert clf.label_to_id == {l: i for i, l in enumerate(labels)}
    assert clf.train_steps == 7
    assert clf.training_history == {l: 25 for l in labels}
    # prototypes exact
    for l in labels:
        np.testing.assert_allclose(clf.memory.prototypes[l], protos[l], atol=1e-6)
    # head logits match the torch head on its logical classes
    x = np.random.default_rng(1).standard_normal((3, DIM)).astype(np.float32)
    head.eval()
    with torch.no_grad():
        expect = head(torch.tensor(x)).numpy()
    import jax.numpy as jnp
    from adaptive_classifier_tpu.models import head as head_lib

    got = np.asarray(head_lib.head_forward(clf.head_params, jnp.asarray(x)))[:, :3]
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_reference_checkpoint_predicts_and_continues(tmp_path):
    labels, protos, _ = write_reference_style_checkpoint(tmp_path / "ref")
    clf = AdaptiveClassifier.load(str(tmp_path / "ref"))
    # prediction near a stored prototype must hit that class via the kNN path
    q = protos[labels[1]]
    preds = clf._predict_from_embedding(np.asarray(q, np.float32), k=3)
    assert preds[0][0] == labels[1]
    # continue training on top of the restored state
    clf.add_examples([f"new {i}" for i in range(4)], ["class_new"] * 4)
    assert "class_new" in clf.label_to_id
    assert clf.label_to_id["class_new"] == 3


ROUTER_DIR = Path("/root/reference/scripts/adaptive_router")


@pytest.mark.skipif(not ROUTER_DIR.exists(), reason="reference artifact absent")
def test_real_trained_router_checkpoint_loads_and_predicts():
    """Load the REAL trained llm-router checkpoint the reference ships
    (scripts/adaptive_router/: legacy config-embedded-examples layout,
    ``tensors.safetensors``, real distilbert-base-cased embeddings and a
    trained 768→768→384→2 head).  Every stored example's real embedding must
    classify to its own label through the full proto+head fusion path — a
    real-data correctness check, no synthetic embeddings anywhere."""
    clf = AdaptiveClassifier.load(str(ROUTER_DIR))
    assert set(clf.label_to_id) == {"HIGH", "LOW"}
    assert clf.head_params is not None
    correct = total = 0
    for label, exs in clf.memory.examples.items():
        for ex in exs:
            preds = clf._predict_from_embedding(
                np.asarray(ex.embedding, np.float32), k=2
            )
            total += 1
            correct += preds[0][0] == label
    assert total == 10
    assert correct >= 8, f"only {correct}/{total} self-consistent"


def test_our_save_matches_reference_file_contract(tmp_path):
    """Our save output satisfies the structural contract the reference's
    loader expects (classifier.py:630-915): file names, tensor names in
    torch layout, str-keyed id map, config keys."""
    from safetensors.torch import load_file as torch_load

    from tests.conftest import synthetic_embed

    clf = AdaptiveClassifier("prajjwal1/bert-tiny", config={
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32],
    })
    clf._get_embeddings = lambda t: synthetic_embed(t, dim=128)
    clf.add_examples(["a:1", "b:1", "a:2", "b:2"], ["a", "b", "a", "b"])
    out = tmp_path / "ours"
    clf.save(str(out))

    cfg = json.loads((out / "config.json").read_text())
    for key in ("model_name", "embedding_dim", "label_to_id", "id_to_label",
                "train_steps", "training_history", "config", "library_name"):
        assert key in cfg
    assert all(isinstance(k, str) for k in cfg["id_to_label"])
    for key in ("prototype_weight", "neural_weight", "ewc_lambda", "max_length"):
        assert key in cfg["config"]

    # torch can read the tensors (layout contract)
    tensors = torch_load(str(out / "model.safetensors"))
    assert tensors["prototype_a"].shape == (128,)
    assert tensors["adaptive_head_model.0.weight"].shape == (128, 128)
    assert tensors["adaptive_head_model.6.weight"].shape[0] == 2  # [out, in]

    ex = json.loads((out / "examples.json").read_text())
    for label, items in ex.items():
        for item in items:
            assert set(item) == {"text", "label", "embedding"}
            assert len(item["embedding"]) == 128
