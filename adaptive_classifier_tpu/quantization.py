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
    ``name.scale`` pairs — symmetric, per OUTPUT channel (the reduction
    runs over the contraction axis ``ndim-2``; e.g. ``[L, in, out]`` →
    scale ``[L, out]``).  A per-layer-matrix scalar scale would let one
    outlier channel crush the resolution of every other channel in that
    matrix — pretrained BERT FFNs have exactly such outliers."""
    flat = _flatten(jax.tree.map(np.asarray, params))
    tensors: Dict[str, np.ndarray] = {}
    manifest = {"quantized": [], "passthrough": []}
    for name, w in flat.items():
        w = np.asarray(w, np.float32)
        if w.ndim >= 2 and w.size >= _MIN_QUANT_SIZE:
            axis = w.ndim - 2
            absmax = np.maximum(np.abs(w).max(axis=axis, keepdims=True), 1e-8)
            scale = (absmax / 127.0).astype(np.float32)
            q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            tensors[f"{name}.int8"] = q
            tensors[f"{name}.scale"] = np.squeeze(scale, axis=axis)
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
            # scale was squeezed at axis ndim-2 of the weight
            flat[base] = value.astype(np.float32) * np.expand_dims(
                scale, axis=value.ndim - 2)
        elif name.endswith(".scale"):
            continue
        else:
            flat[name] = value
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, _unflatten(flat))


def dequantize_runtime_tree(params: Any) -> Any:
    """Float tree from an encoder_int8 runtime tree (``name.int8`` +
    ``name.scale`` with per-output-channel scales, stacked over layers).
    Only approximate for q/k/v (they were fused before quantization) —
    the fused ``qkv_w`` is split back into thirds."""
    import jax.numpy as jnp

    layers = dict(params["layers"])
    out: Dict[str, Any] = {}
    for name, v in layers.items():
        if name.endswith(".int8"):
            base = name[: -len(".int8")]
            s = layers[f"{base}.scale"]
            out[base] = np.asarray(v, np.float32) * np.asarray(s)[:, None, :]
        elif name.endswith(".scale"):
            continue
        else:
            out[name] = np.asarray(v)
    if "qkv_w" in out:
        w = out.pop("qkv_w")          # [L, D, 3D]
        b = out.pop("qkv_b")          # [L, 3D]
        D = w.shape[1]
        for i, nm in enumerate(("q", "k", "v")):
            out[f"{nm}_w"] = np.ascontiguousarray(w[:, :, i * D:(i + 1) * D])
            out[f"{nm}_b"] = np.ascontiguousarray(b[:, i * D:(i + 1) * D])
    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    return {"embeddings": to_j(dict(params["embeddings"])), "layers": to_j(out)}


def save_quantized_encoder(encoder, directory: Path) -> Path:
    """Write ``quantized/model_int8.safetensors`` + arch config + vocab.

    Two formats: a float-path encoder exports the standard
    ``int8_symmetric_per_channel`` scheme; an int8-mode encoder's params
    are ALREADY a runtime int8 tree — re-quantizing int8 leaves would
    corrupt them (``.int8.int8`` double quantization), so that tree is
    stored verbatim with ``format=runtime_int8_tree``."""
    from safetensors.numpy import save_file

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    runtime_tree = "qkv_w.int8" in getattr(encoder, "params", {}).get("layers", {})
    if runtime_tree:
        tensors = _flatten(jax.tree.map(np.asarray, encoder.params))
        manifest = {"quantized": sorted(n for n in tensors if ".int8" in n),
                    "passthrough": sorted(n for n in tensors if ".int8" not in n)}
    else:
        tensors, manifest = quantize_tree(encoder.params)
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, str(directory / "model_int8.safetensors"))
    (directory / "quantize_config.json").write_text(json.dumps({
        "scheme": "int8_symmetric_per_channel",
        "format": "runtime_int8_tree" if runtime_tree else "standard",
        "encoder_config": encoder.config.__dict__,
        "encoder_pretrained": bool(getattr(encoder, "pretrained", False)),
        "manifest": manifest,
    }, indent=2))
    # the weights are meaningless without the vocab they were trained with:
    # restore on a machine without the base checkpoint would otherwise pair
    # pretrained rows with the hermetic fallback tokenizer's ids
    vocab = getattr(getattr(encoder, "tokenizer", None), "vocab", None)
    if vocab:
        tokens = [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
        (directory / "vocab.txt").write_text("\n".join(tokens) + "\n",
                                             encoding="utf-8")
    return directory


def load_quantized_encoder_params(
    directory: Path, want: str = "float"
) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    """→ (params, encoder_config_dict, quantize_config).

    ``want="float"`` returns a float param tree for the bf16 path;
    ``want="int8"`` returns a runtime int8 tree for the int8 path —
    whichever the file stores, the other form is derived."""
    from safetensors.numpy import load_file

    directory = Path(directory)
    tensors = load_file(str(directory / "model_int8.safetensors"))
    cfg = json.loads((directory / "quantize_config.json").read_text())
    stored = cfg.get("format", "standard")
    if stored == "runtime_int8_tree":
        tree = _unflatten({k: v for k, v in tensors.items()})
        params = tree if want == "int8" else dequantize_runtime_tree(tree)
    else:
        params = dequantize_tree(tensors)
        if want == "int8":
            from .models.encoder_int8 import quantize_encoder_for_inference

            params = jax.jit(quantize_encoder_for_inference)(params)
    return params, cfg["encoder_config"], cfg
