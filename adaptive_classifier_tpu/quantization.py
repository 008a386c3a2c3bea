"""Int8 encoder quantization — the quantized-ONNX analog.

The reference exports INT8 dynamically-quantized ONNX models (4× smaller,
faster CPU inference; reference: src/adaptive_classifier/classifier.py:
1031-1107, README claims at README.md:244).  On TPU the jitted bf16 forward
already *is* the fast path, so quantization here is the storage/memory story:
per-output-channel symmetric int8 for every weight matrix, float32 for
norms/biases — a ~4× smaller checkpoint (``quantized/model_int8.safetensors``,
the analog of ``onnx/model_quantized.onnx``) that dequantizes into the same
bf16 compute path on load.

Embedding-quality parity is covered by tests the way the reference checks
ONNX-vs-PyTorch cosine similarity (tests/test_onnx_phase1.py:68-96).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

#: weights smaller than this stay float32 (scales/biases/norms)
_MIN_QUANT_SIZE = 1024


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for name, value in flat.items():
        parts = name.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def quantize_tree(params: Any) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """→ (tensors, manifest).  Quantized entries become ``name.int8`` +
    ``name.scale`` pairs (symmetric, per leading-axis channel)."""
    flat = _flatten(jax.tree.map(np.asarray, params))
    tensors: Dict[str, np.ndarray] = {}
    manifest = {"quantized": [], "passthrough": []}
    for name, w in flat.items():
        w = np.asarray(w, np.float32)
        if w.ndim >= 2 and w.size >= _MIN_QUANT_SIZE:
            axes = tuple(range(1, w.ndim))
            absmax = np.maximum(np.abs(w).max(axis=axes, keepdims=True), 1e-8)
            scale = (absmax / 127.0).astype(np.float32)
            q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            tensors[f"{name}.int8"] = q
            tensors[f"{name}.scale"] = np.squeeze(scale, axis=axes)
            manifest["quantized"].append(name)
        else:
            tensors[name] = w
            manifest["passthrough"].append(name)
    return tensors, manifest


def dequantize_tree(tensors: Dict[str, np.ndarray]) -> Any:
    flat: Dict[str, np.ndarray] = {}
    for name, value in tensors.items():
        if name.endswith(".int8"):
            base = name[: -len(".int8")]
            scale = tensors[f"{base}.scale"]
            shape = (-1,) + (1,) * (value.ndim - 1)
            flat[base] = value.astype(np.float32) * scale.reshape(shape)
        elif name.endswith(".scale"):
            continue
        else:
            flat[name] = value
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, _unflatten(flat))


def save_quantized_encoder(encoder, directory: Path) -> Path:
    """Write ``quantized/model_int8.safetensors`` + arch config."""
    from safetensors.numpy import save_file

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    tensors, manifest = quantize_tree(encoder.params)
    save_file(tensors, str(directory / "model_int8.safetensors"))
    (directory / "quantize_config.json").write_text(json.dumps({
        "scheme": "int8_symmetric_per_channel",
        "encoder_config": encoder.config.__dict__,
        "encoder_pretrained": bool(getattr(encoder, "pretrained", False)),
        "manifest": manifest,
    }, indent=2))
    return directory


def load_quantized_encoder_params(directory: Path) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    from safetensors.numpy import load_file

    directory = Path(directory)
    tensors = load_file(str(directory / "model_int8.safetensors"))
    cfg = json.loads((directory / "quantize_config.json").read_text())
    return dequantize_tree(tensors), cfg["encoder_config"], cfg
