"""Checkpoint save/load — reference-compatible on-disk format.

Implements the reference's persistence layer (reference:
src/adaptive_classifier/classifier.py:524-915,1109-1213): ``config.json``
(label maps, train_steps, training_history, full config), ``examples.json``
(k-means-selected representative examples per class), ``model.safetensors``
(``prototype_{label}`` vectors + ``adaptive_head_model.*`` tensors in torch
``[out, in]`` layout), and an auto-generated model-card ``README.md``.

Checkpoints are interchangeable with the reference: a classifier saved here
loads in the reference library and vice versa (the ONNX directory the
reference optionally adds has no TPU analog — the jitted XLA forward is the
optimized path — and is simply absent/ignored).

Checkpointing is lossy by design, exactly like the reference: only
``num_representative_examples`` examples per class survive the round-trip,
but prototypes and head weights are exact, so predictions stay consistent
(reference tests/test_confidence_consistency.py:9-46).
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from safetensors.numpy import load_file, save_file

from .config import Example
from .models import head as head_lib

logger = logging.getLogger(__name__)


def save_classifier(clf, save_directory: Path, include_quantized: bool = True) -> Dict[str, str]:
    save_directory = Path(save_directory)
    os.makedirs(save_directory, exist_ok=True)

    config_dict = {
        "model_name": clf.model_name,
        "embedding_dim": clf.embedding_dim,
        "label_to_id": clf.label_to_id,
        "id_to_label": {str(k): v for k, v in clf.id_to_label.items()},
        "train_steps": clf.train_steps,
        "training_history": clf.training_history,
        "config": clf.config.to_full_dict(),
        # ours (ignored by the reference): the classifier seed must survive
        # the round trip — in offline mode the encoder's deterministic
        # random weights derive from (seed, model_name), so loading with a
        # different seed would silently rebuild a DIFFERENT embedding space
        # than the saved prototypes live in
        "ac_seed": clf.seed,
        "library_name": "adaptive-classifier",
    }
    # fold-fitted fusion share (config.fusion_weights="auto") — without it a
    # reload would fall back to reference weighting until the next retrain
    if getattr(clf, "_fusion_alpha", None) is not None:
        config_dict["ac_fusion_alpha"] = float(clf._fusion_alpha)

    # representative examples (classifier.py:559-566)
    saved_examples: Dict[str, Any] = {}
    for label, examples in clf.memory.examples.items():
        reps = clf.select_representative_examples(
            examples, k=clf.config.num_representative_examples
        )
        saved_examples[label] = [ex.to_dict() for ex in reps]

    # tensors (classifier.py:568-591)
    tensor_dict: Dict[str, np.ndarray] = {}
    for label, proto in clf.memory.prototypes.items():
        tensor_dict[f"prototype_{label}"] = np.asarray(proto, np.float32)
    if clf.head_params is not None:
        sd = head_lib.to_torch_state_dict(clf.head_params, max(len(clf.label_to_id), 1))
        for name, tensor in sd.items():
            tensor_dict[f"adaptive_head_{name}"] = tensor
    # post-incremental prototype recalibration (classifier._proto_bias).
    # Extra tensor key — the reference loader only reads prototype_*/
    # adaptive_head_* keys, so its checkpoints stay loadable both ways.
    if getattr(clf, "_proto_bias", None) is not None:
        tensor_dict["proto_calibration_bias"] = np.ascontiguousarray(
            np.asarray(clf._proto_bias, np.float32))

    # lexical channel state (ours): fitted IDF table + resolved weight.
    # Without it a reload would refit on a different batch and rebuild a
    # different embedding space than the stored prototypes live in.  A
    # lexical checkpoint is NOT reference-loadable (embedding_dim differs);
    # the reference ignores both this file and the config keys.
    if getattr(clf, "lexical", None) is not None and clf.lexical.fitted:
        clf.lexical.save(save_directory / "lexical.json")

    (save_directory / "config.json").write_text(
        json.dumps(config_dict, indent=2, sort_keys=True), encoding="utf-8"
    )
    (save_directory / "examples.json").write_text(
        json.dumps(saved_examples, indent=2, sort_keys=True), encoding="utf-8"
    )
    save_file(tensor_dict, str(save_directory / "model.safetensors"))

    model_card_path = save_directory / "README.md"
    if not model_card_path.exists():
        model_card_path.write_text(generate_model_card(clf), encoding="utf-8")

    saved = {
        "config": "config.json",
        "examples": "examples.json",
        "model": "model.safetensors",
        "model_card": "README.md",
    }

    # fine-tuned encoder weights (classifier.finetune_encoder): without
    # persisting them, load() would rebuild the encoder from model_name and
    # silently discard the adaptation.  HF-layout subdir so Encoder(path)
    # (and transformers) load it directly.  No reference analog — the
    # reference's encoder is frozen (classifier.py:58-85).
    if getattr(clf.encoder, "_finetuned", False):
        from .pretrain import save_hf_checkpoint

        vocab = getattr(clf.encoder.tokenizer, "vocab", None)
        if clf.encoder.config.arch != "bert" or not vocab:
            # a checkpoint whose prototypes/head live in the fine-tuned
            # space but whose encoder reverts to base weights on load is
            # silently broken — refuse to write it
            raise ValueError(
                f"cannot persist the fine-tuned '{clf.encoder.config.arch}' "
                f"encoder (HF export supports arch 'bert' with a WordPiece "
                f"vocab); saving without it would produce a checkpoint "
                f"whose prototypes/head disagree with the encoder on load"
            )
        tokens = [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
        save_hf_checkpoint(
            clf.encoder.params, clf.encoder.config,
            save_directory / "encoder", tokens,
            extra_config={
                "ac_finetuned_from": clf.model_name,
                "ac_pooling": clf.encoder.config.pooling,
                "ac_pool_layer": clf.encoder.config.pool_layer,
            },
        )
        saved["encoder"] = "encoder/"

    # int8 encoder export — the onnx/ directory analog (on by default like
    # the reference's include_onnx, classifier.py:600-615)
    if include_quantized:
        try:
            from .quantization import save_quantized_encoder

            save_quantized_encoder(clf.encoder, save_directory / "quantized")
            saved["quantized"] = "quantized/"
        except Exception as e:
            logger.warning(f"Skipping quantized export due to error: {e}")

    return saved


def load_classifier(cls, model_path: Path, device: Optional[str] = None):
    model_path = Path(model_path)
    config_dict = json.loads((model_path / "config.json").read_text(encoding="utf-8"))
    examples_file = model_path / "examples.json"
    if examples_file.exists():
        saved_examples = json.loads(examples_file.read_text(encoding="utf-8"))
    else:
        # older on-disk layout embedded examples inside config.json
        # (reference scripts/adaptive_router/config.json, SURVEY.md §5)
        saved_examples = config_dict.get("examples", {})

    model_name = config_dict["model_name"]
    embedded_encoder = model_path / "encoder"
    if (embedded_encoder / "config.json").exists():
        # checkpoint carries fine-tuned encoder weights — they override the
        # base model_name (finetune_encoder persistence, see save side)
        model_name = str(embedded_encoder)
    elif "/" in model_name and not Path(model_name).exists():
        # a checkpoint may reference a local encoder by a path relative to
        # the repo it was built in (e.g. the committed zoo references
        # checkpoints/ac-tiny); resolve against the checkpoint's ancestors
        # so loading works from any working directory
        for anc in [model_path, *list(model_path.parents)[:4]]:
            cand = anc / model_name
            if (cand / "config.json").exists():
                model_name = str(cand)
                break
    clf = cls(
        model_name,
        device=device,
        config=config_dict.get("config", None),
        # restore the saved seed (see save side): offline-mode encoders are
        # seeded by (seed, model_name); reference checkpoints lack the key
        # and keep the constructor default
        seed=config_dict.get("ac_seed", 42),
    )
    if "ac_fusion_alpha" in config_dict:
        clf._fusion_alpha = float(config_dict["ac_fusion_alpha"])
    lex_file = model_path / "lexical.json"
    if lex_file.exists() and clf.lexical is not None:
        from .lexical import HashedTfidf

        clf.lexical = HashedTfidf.load(lex_file)
    if model_name == str(embedded_encoder):
        # keep the user-facing base-model identity, and mark the encoder so
        # a re-save persists the adapted weights again
        clf.model_name = config_dict["model_name"]
        clf.encoder._finetuned = True
    # If the encoder's real weights aren't available here (no local HF
    # checkpoint) but the checkpoint's int8 export captured a *pretrained*
    # encoder, restore from it — an int8 approximation of the true weights
    # beats the offline fallback.  Quantized is never preferred when full
    # weights exist: unlike the reference's ONNX path (2-4× faster on CPU),
    # int8 brings no TPU speed win; bf16 MXU is already the fast path.
    qdir = model_path / "quantized"
    if not getattr(clf.encoder, "pretrained", False) and (qdir / "model_int8.safetensors").exists():
        try:
            from .quantization import load_quantized_encoder_params
            from .models.encoder import EncoderConfig

            want = "int8" if clf.encoder.quantization == "int8" else "float"
            params, enc_cfg, qcfg = load_quantized_encoder_params(qdir, want=want)
            if qcfg.get("encoder_pretrained", False):
                # the export's vocab must come along: pretrained rows paired
                # with the hermetic fallback tokenizer's ids would embed
                # confident nonsense
                tokenizer = None
                if (qdir / "vocab.txt").exists():
                    from .models.tokenizer import WordPieceTokenizer

                    tokenizer = WordPieceTokenizer.from_pretrained(str(qdir))
                elif getattr(clf.encoder.tokenizer, "vocab", None) is None or \
                        not getattr(clf.encoder, "pretrained", False):
                    raise ValueError(
                        "int8 export has no vocab.txt and no real tokenizer "
                        "is available — refusing to pair pretrained weights "
                        "with the hermetic fallback vocabulary"
                    )
                # restore_params rebuilds the jitted closures — assigning
                # .config/.params alone would leave the old closure's cfg
                # (and, on the int8 path, a float/int8 tree mismatch)
                clf.encoder.restore_params(
                    params, config=EncoderConfig(**enc_cfg),
                    tokenizer=tokenizer, pretrained=True)
                logger.info("Restored encoder weights from int8 checkpoint export")
                # the export's config is authoritative (the offline guess
                # may have different dims entirely); the memory is still
                # empty at this point, so rebuild it at the true dim
                if clf.embedding_dim != clf.encoder.hidden_size:
                    from .memory import PrototypeMemory

                    clf.embedding_dim = clf.encoder.hidden_size
                    clf.memory = PrototypeMemory(clf.embedding_dim,
                                                 config=clf.config)
        except Exception as e:
            logger.warning(f"Could not restore quantized encoder: {e}")

    saved_dim = config_dict.get("embedding_dim")
    if saved_dim is not None and saved_dim != clf.embedding_dim:
        raise ValueError(
            f"Checkpoint at {model_path} was built with a {saved_dim}-dim "
            f"encoder ('{config_dict['model_name']}'), but the resolved "
            f"encoder produces {clf.embedding_dim}-dim embeddings — the "
            f"original encoder checkpoint is unavailable and no compatible "
            f"offline architecture exists for that name."
        )

    # restore label maps in id order so memory slots == label ids
    clf.label_to_id = dict(config_dict["label_to_id"])
    clf.id_to_label = {int(k): v for k, v in config_dict["id_to_label"].items()}
    for idx in sorted(clf.id_to_label):
        clf.memory.register_label(clf.id_to_label[idx])
    clf.train_steps = config_dict["train_steps"]
    clf.training_history = dict(config_dict.get("training_history", {}))

    tensors_path = model_path / "model.safetensors"
    if not tensors_path.exists() and (model_path / "tensors.safetensors").exists():
        # pre-rename legacy layout (reference scripts/adaptive_router/ ships
        # one: config.json with embedded examples + tensors.safetensors)
        tensors_path = model_path / "tensors.safetensors"
    tensors = load_file(str(tensors_path))

    # restore examples + exact saved prototypes (classifier.py:879-895)
    for label in clf.label_to_id:
        ex_data = saved_examples.get(label, [])
        texts = [d["text"] for d in ex_data]
        embs = (
            np.asarray([d["embedding"] for d in ex_data], np.float32)
            if ex_data and ex_data[0].get("embedding") is not None
            else np.zeros((len(texts), clf.embedding_dim), np.float32)
        )
        proto = tensors.get(f"prototype_{label}")
        if texts or proto is not None:
            # the saved prototype aggregates every example the class ever
            # trained on — training_history carries that count across the
            # lossy (5 representative rows/class) save, so future adds
            # update it as a weighted running mean (memory.add_batch)
            clf.memory.restore_class(
                label, texts, embs, prototype=proto,
                prototype_weight=clf.training_history.get(label, 0))

    # restore head (classifier.py:897-906)
    head_sd = {
        k[len("adaptive_head_"):]: v
        for k, v in tensors.items()
        if k.startswith("adaptive_head_")
    }
    if head_sd:
        params, _ = head_lib.from_torch_state_dict(head_sd, clf._class_capacity)
        clf.head_params = params
        clf._ensure_head_capacity()

    # restore prototype recalibration bias (ours; absent in reference saves)
    if "proto_calibration_bias" in tensors:
        clf._proto_bias = np.asarray(tensors["proto_calibration_bias"],
                                     np.float32)

    # back-compat training-history estimate (classifier.py:908-913)
    if not clf.training_history:
        for label, examples in saved_examples.items():
            clf.training_history[label] = len(examples) * 20

    return clf


def from_pretrained(cls, model_id: str, device: Optional[str] = None,
                    download_fn=None, **kwargs):
    """Local directory, or HuggingFace Hub download when available.

    ``download_fn(repo_id=..., filename=..., **opts) -> local path`` defaults
    to ``huggingface_hub.hf_hub_download``; injectable so the Hub path is
    unit-testable offline (reference analog: classifier.py:680-760).
    """
    path = Path(model_id)
    if path.is_dir() and (path / "config.json").exists():
        return load_classifier(cls, path, device=device)
    if download_fn is None:
        try:
            from huggingface_hub import hf_hub_download as download_fn
        except ImportError as e:
            raise ValueError(f"Error loading model from {model_id}: {e}")
    opts = {
        k: v for k, v in kwargs.items()
        if k in ("revision", "cache_dir", "force_download", "token", "local_files_only")
    }
    try:
        config_file = download_fn(repo_id=model_id, filename="config.json", **opts)
        for fname in ("examples.json", "model.safetensors"):
            try:
                download_fn(repo_id=model_id, filename=fname, **opts)
            except Exception:
                # examples.json is absent in the legacy config-embedded
                # layout; model.safetensors absence fails below at load
                if fname == "model.safetensors":
                    raise
        # fine-tuned encoder subdir (present only after finetune_encoder +
        # push_to_hub); without it load would silently rebuild the base
        # encoder while prototypes/head live in the fine-tuned space.
        # load_classifier detects encoder/config.json on disk itself.
        try:
            download_fn(repo_id=model_id, filename="encoder/config.json", **opts)
        except Exception:
            pass  # no fine-tuned encoder in this repo
        else:
            # repo advertises one — the remaining files are then required
            for fname in ("encoder/model.safetensors", "encoder/vocab.txt"):
                download_fn(repo_id=model_id, filename=fname, **opts)
            try:
                download_fn(repo_id=model_id,
                            filename="encoder/tokenizer_config.json", **opts)
            except Exception:
                pass  # optional (defaults to lowercase WordPiece)
        return load_classifier(cls, Path(os.path.dirname(config_file)), device=device)
    except Exception as e:
        raise ValueError(f"Error loading model from {model_id}: {e}")


def push_to_hub(clf, repo_id: str, token: Optional[str] = None,
                commit_message: Optional[str] = None, private: bool = False, **kwargs):
    """Reference classifier.py:1109-1182."""
    import tempfile

    try:
        from huggingface_hub import HfApi
    except ImportError as e:
        raise ImportError(f"huggingface_hub is required for push_to_hub: {e}")

    token = token or os.environ.get("HF_TOKEN")
    with tempfile.TemporaryDirectory() as tmpdir:
        save_classifier(clf, Path(tmpdir))
        api = HfApi()
        try:
            api.create_repo(repo_id=repo_id, token=token, private=private, exist_ok=True)
        except Exception as e:
            logger.warning(f"Could not create repo (may already exist): {e}")
        api.upload_folder(
            folder_path=tmpdir, repo_id=repo_id, token=token,
            commit_message=commit_message or "Upload model with adaptive-classifier-tpu",
            **kwargs,
        )
    logger.info(f"Successfully pushed model to https://huggingface.co/{repo_id}")
    return f"https://huggingface.co/{repo_id}"


def generate_model_card(clf) -> str:
    """Auto-generated model card (classifier.py:917-1029)."""
    stats = clf.get_memory_stats()
    dist_lines = []
    total = sum(stats["examples_per_class"].values()) or 1
    for label, count in sorted(stats["examples_per_class"].items()):
        dist_lines.append(f"{label}: {count} examples ({count / total * 100:.1f}%)")
    dist = "\n".join(dist_lines) or "No examples stored"
    return f"""---
language: multilingual
tags:
- adaptive-classifier
- text-classification
- continuous-learning
license: apache-2.0
---

# Adaptive Classifier (TPU)

This model is an instance of an adaptive classifier supporting continuous
learning and dynamic class addition, running on the TPU-native
`adaptive-classifier-tpu` framework (JAX/XLA/Pallas).

## Model Details

- Base Model: {clf.model_name}
- Number of Classes: {stats['num_classes']}
- Total Examples: {stats['total_examples']}
- Embedding Dimension: {clf.embedding_dim}

## Class Distribution

```
{dist}
```

## Usage

```python
from adaptive_classifier_tpu import AdaptiveClassifier

classifier = AdaptiveClassifier.from_pretrained("path-or-repo")
predictions = classifier.predict("Your text here")

classifier.add_examples(["Example 1", "Example 2"], ["class1", "class2"])
```

## Training Details

- Training Steps: {clf.train_steps}
- Prototype Memory: Active
- Neural Adaptation: {"Active" if clf.head_params is not None else "Inactive"}

## Limitations

This model:
- Requires at least {clf.config.min_examples_per_class} examples per class
- Has a maximum of {clf.config.max_examples_per_class} examples per class
"""
