"""Device mesh construction and sharding specs.

The reference has zero distributed capability (SURVEY.md §2.3) — scaling is a
new TPU-first design, not a port.  The scaling story (BASELINE.json): shard
the prototype/example matrices and the head's class dimension across ICI
("tp" axis), shard batches across "dp", annotate with NamedSharding, and let
XLA insert the collectives.

Layout choices:
- example buffer ``[C, E, D]`` and prototypes ``[C, D]`` shard on the class
  axis → kNN distance blocks are computed shard-locally, only the tiny
  top-k/softmax reduction crosses ICI;
- head output layer ``[Dh, C]`` shards on the class axis (column parallel —
  logits come out class-sharded, softmax's reduction is the only collective);
- encoder parameters replicate (BERT-class models are small relative to HBM);
  activations shard on batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    """Build a ("dp", "tp") mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None and tp is None:
        # default: dp gets the LARGER factor (throughput-first — batch
        # parallelism is what serving needs until the index outgrows one
        # shard's HBM); pass tp= explicitly for index-capacity-first
        # layouts.  tp = largest divisor ≤ √n, e.g. n=8 → dp=4, tp=2.
        tp = 1
        for cand in range(int(np.sqrt(n)), 0, -1):
            if n % cand == 0:
                tp = cand
                break
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, (dp, tp, n)
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


def memory_shardings(mesh: Mesh):
    """Shardings for a MemoryState pytree: class axis over 'tp'."""
    return {
        "emb": NamedSharding(mesh, P("tp", None, None)),
        "count": NamedSharding(mesh, P("tp")),
        "proto": NamedSharding(mesh, P("tp", None)),
        "pweight": NamedSharding(mesh, P("tp")),
    }


def head_shardings(mesh: Mesh, params) -> dict:
    """Column-parallel output layer; hidden layers replicated."""
    hidden = [
        {"w": NamedSharding(mesh, P(None, None)), "b": NamedSharding(mesh, P(None))}
        for _ in params["hidden"]
    ]
    return {
        "hidden": hidden,
        "out": {
            "w": NamedSharding(mesh, P(None, "tp")),
            "b": NamedSharding(mesh, P("tp")),
        },
    }


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int):
    """First axis over 'dp', rest replicated."""
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))
