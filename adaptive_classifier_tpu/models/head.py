"""Adaptive classification head — functional MLP over padded class slots.

TPU-native re-design of the reference's ``AdaptiveHead`` (reference:
src/adaptive_classifier/models.py:30-98).  The torch version is an
``nn.Sequential`` whose output layer is literally re-allocated when classes
grow; here the output layer is allocated at the padded class capacity and
"growing" is just unmasking columns — ``update_num_classes``'s weight-copy
semantics become a no-op, and the jitted train/predict functions never see a
shape change until a capacity bucket is crossed.

Initialization matches the reference's *guarantees* (Kaiming-uniform fan-in
hidden layers, Xavier-uniform output, zero biases, fixed seed ⇒ reproducible:
models.py:51-66) using a threaded JAX PRNG rather than torch's global seed.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HeadParams = Dict[str, Any]

NEG_INF = -1e9
DROPOUT_RATE = 0.1


def _kaiming_uniform(key, fan_in: int, shape) -> jax.Array:
    # torch kaiming_uniform_(mode='fan_in', nonlinearity='relu'):
    # bound = sqrt(2) * sqrt(3 / fan_in)
    bound = float(np.sqrt(6.0 / fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _xavier_uniform(key, fan_in: int, fan_out: int, shape) -> jax.Array:
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_head(
    key: jax.Array,
    input_dim: int,
    class_capacity: int,
    num_classes: int,
    hidden_dims: Optional[Sequence[int]] = None,
) -> HeadParams:
    """Weights stored ``[in, out]`` for ``x @ W`` (MXU-friendly, no transpose).

    The Xavier bound of the output layer uses the *logical* class count at
    init time, matching the reference's behavior of sizing the layer to the
    classes it knows about (models.py:63-66).
    """
    if hidden_dims is None:
        hidden_dims = [input_dim]
    hidden = []
    prev = input_dim
    keys = jax.random.split(key, len(hidden_dims) + 1)
    for i, dim in enumerate(hidden_dims):
        hidden.append({
            "w": _kaiming_uniform(keys[i], prev, (prev, dim)),
            "b": jnp.zeros((dim,), jnp.float32),
        })
        prev = dim
    out_w = _xavier_uniform(keys[-1], prev, max(num_classes, 1), (prev, class_capacity))
    return {
        "hidden": hidden,
        "out": {"w": out_w, "b": jnp.zeros((class_capacity,), jnp.float32)},
    }


def head_forward(
    params: HeadParams,
    x: jax.Array,                      # [B, D]
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Raw logits over all class slots ``[B, C_cap]``."""
    h = x
    for i, layer in enumerate(params["hidden"]):
        h = jnp.maximum(h @ layer["w"] + layer["b"], 0.0)
        if train and dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - DROPOUT_RATE, h.shape)
            h = jnp.where(keep, h / (1.0 - DROPOUT_RATE), 0.0)
    logits = h @ params["out"]["w"] + params["out"]["b"]
    if "skip" in params:
        # per-class linear probe on the RAW embedding (zero for classes that
        # never trained it).  Exists for classes added incrementally after a
        # lossy load: the frozen trunk's first layer never saw the new
        # class's discriminative input coordinates (they were absent from
        # the build-time data), so no function of h(x) can separate the new
        # class — but a linear probe on x itself can.
        logits = logits + x @ params["skip"]["w"]
    return logits


def masked_probs(logits: jax.Array, active: jax.Array) -> jax.Array:
    """Softmax over active class slots only — inactive slots get probability 0.

    Equivalent to the reference softmaxing over a layer sized to the active
    classes (classifier.py:428-442)."""
    masked = jnp.where(active[None, :], logits, NEG_INF)
    probs = jax.nn.softmax(masked, axis=-1)
    return jnp.where(active[None, :], probs, 0.0)


def grow_capacity(params: HeadParams, new_capacity: int, key: jax.Array,
                  num_classes: int) -> HeadParams:
    """Cross a class-capacity bucket: repad the output layer.

    Existing columns are copied verbatim (the weight-preserving growth of
    models.py:82-98); new columns are freshly Xavier-initialized."""
    out = params["out"]
    old_cap = out["w"].shape[1]
    if new_capacity <= old_cap:
        return params
    fan_in = out["w"].shape[0]
    fresh = _xavier_uniform(key, fan_in, max(num_classes, 1), (fan_in, new_capacity))
    new_w = fresh.at[:, :old_cap].set(out["w"])
    new_b = jnp.zeros((new_capacity,), jnp.float32).at[:old_cap].set(out["b"])
    grown = {**params, "out": {"w": new_w, "b": new_b}}
    if "skip" in params:
        sw = params["skip"]["w"]
        grown["skip"] = {"w": jnp.zeros((sw.shape[0], new_capacity),
                                        jnp.float32).at[:, :old_cap].set(sw)}
    return grown


def ensure_skip(params: HeadParams, input_dim: int) -> HeadParams:
    """Add a zero skip-probe block if absent (zero ⇒ function unchanged)."""
    if "skip" in params:
        return params
    cap = params["out"]["w"].shape[1]
    return {**params,
            "skip": {"w": jnp.zeros((input_dim, cap), jnp.float32)}}


def head_l2_sq_diff(params: HeadParams, old: HeadParams) -> jax.Array:
    leaves_new = jax.tree.leaves(params)
    leaves_old = jax.tree.leaves(old)
    return sum(jnp.sum((a - b) ** 2) for a, b in zip(leaves_new, leaves_old))


# ---------------------------------------------------------------------------
# (de)serialization — reference-compatible torch Sequential naming
# ---------------------------------------------------------------------------

def to_torch_state_dict(params: HeadParams, num_classes: int) -> Dict[str, np.ndarray]:
    """Serialize with the reference's tensor names/layouts so checkpoints
    interoperate: ``model.{0,3,...}.weight`` are torch ``[out, in]`` matrices,
    the output layer is trimmed to the logical class count
    (classifier.py:576-578 saves ``adaptive_head_model.*``)."""
    sd: Dict[str, np.ndarray] = {}
    idx = 0
    for layer in params["hidden"]:
        sd[f"model.{idx}.weight"] = np.asarray(layer["w"]).T.copy()
        sd[f"model.{idx}.bias"] = np.asarray(layer["b"]).copy()
        idx += 3  # Linear, ReLU, Dropout
    sd[f"model.{idx}.weight"] = np.asarray(params["out"]["w"]).T[:num_classes].copy()
    sd[f"model.{idx}.bias"] = np.asarray(params["out"]["b"])[:num_classes].copy()
    if "skip" in params:
        skip = np.asarray(params["skip"]["w"]).T[:num_classes]
        if np.any(skip):
            # written only when nonzero: a checkpoint that never used the
            # lossy-replay incremental path stays byte-compatible with the
            # reference's strict nn.Sequential load (classifier.py:897-906)
            sd["skip.weight"] = skip.copy()
    return sd


class AdaptiveHead:
    """Object facade over the functional head — API parity with the
    reference's ``nn.Module`` (models.py:30-98) for standalone use/tests.

    ``forward``/``__call__`` return logits over the *logical* classes;
    ``update_num_classes`` grows the output layer preserving weights.
    """

    def __init__(self, input_dim: int, num_classes: int,
                 hidden_dims: Optional[Sequence[int]] = None, seed: int = 42):
        self.input_dim = input_dim
        self.num_classes = num_classes
        self.hidden_dims = list(hidden_dims) if hidden_dims is not None else [input_dim]
        self.seed = seed
        self.params = init_head(
            jax.random.PRNGKey(seed), input_dim, num_classes, num_classes,
            hidden_dims=self.hidden_dims,
        )

    def forward(self, x) -> jax.Array:
        x = jnp.atleast_2d(jnp.asarray(np.asarray(x, np.float32)))
        return head_forward(self.params, x, train=False)[:, : self.num_classes]

    __call__ = forward

    def update_num_classes(self, num_classes: int):
        if num_classes > self.num_classes:
            self.params = grow_capacity(
                self.params, num_classes, jax.random.PRNGKey(self.seed), num_classes
            )
            self.num_classes = num_classes


class MultiLabelAdaptiveHead(AdaptiveHead):
    """Sigmoid-output variant (reference multilabel.py:15-68)."""

    def __init__(self, input_dim: int, num_classes: int,
                 hidden_dims: Optional[Sequence[int]] = None, seed: int = 42):
        if hidden_dims is None:
            hidden_dims = [input_dim // 2]
        super().__init__(input_dim, num_classes, hidden_dims, seed)

    def forward(self, x) -> jax.Array:
        x = jnp.atleast_2d(jnp.asarray(np.asarray(x, np.float32)))
        logits = head_forward(self.params, x, train=False)[:, : self.num_classes]
        return jax.nn.sigmoid(logits)

    __call__ = forward


def from_torch_state_dict(
    sd: Dict[str, np.ndarray], class_capacity: int
) -> Tuple[HeadParams, List[int]]:
    """Load reference-format head tensors into padded params.

    Returns (params, hidden_dims).  Output columns beyond the saved class
    count are zero — they are masked off until classes grow into them."""
    indices = sorted({int(k.split(".")[1]) for k in sd
                      if k.endswith(".weight") and k.startswith("model.")})
    hidden = []
    hidden_dims = []
    for i in indices[:-1]:
        w = np.asarray(sd[f"model.{i}.weight"], np.float32).T
        hidden.append({"w": jnp.asarray(w), "b": jnp.asarray(sd[f"model.{i}.bias"], jnp.float32)})
        hidden_dims.append(w.shape[1])
    last = indices[-1]
    w = np.asarray(sd[f"model.{last}.weight"], np.float32).T  # [Dh, num_classes]
    b = np.asarray(sd[f"model.{last}.bias"], np.float32)
    n = w.shape[1]
    cap = max(class_capacity, n)
    out_w = jnp.zeros((w.shape[0], cap), jnp.float32).at[:, :n].set(w)
    out_b = jnp.zeros((cap,), jnp.float32).at[:n].set(b)
    params: HeadParams = {"hidden": hidden, "out": {"w": out_w, "b": out_b}}
    if "skip.weight" in sd:
        sw = np.asarray(sd["skip.weight"], np.float32).T      # [D_in, n]
        params["skip"] = {"w": jnp.zeros((sw.shape[0], cap),
                                         jnp.float32).at[:, :n].set(sw)}
    return params, hidden_dims
