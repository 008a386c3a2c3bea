"""ShardedAdaptiveClassifier — the multi-chip classifier facade.

Wires the sharding layer into the top-level API: the prototype/example
buffers and the head's class dimension live sharded over the mesh's "tp"
axis (the index-scaling story of BASELINE.json — class/example counts beyond
one chip's HBM), while the public API is unchanged.  Every jitted state
transition (add/prune/prototype recompute/kNN/train) runs under GSPMD with
the shardings carried by the state itself; XLA inserts the ICI collectives.

Placement is enforced at the single point where state is assigned (a
property setter), so capacity growth, restores, and training all stay
sharded without touching the base-class logic.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh

from ..classifier import AdaptiveClassifier
from ..memory import MemoryState, PrototypeMemory
from .mesh import make_mesh, memory_shardings


class ShardedPrototypeMemory(PrototypeMemory):
    """PrototypeMemory whose device state is always tp-sharded on the mesh.

    Above ``shard_knn_min_classes`` prototype slots, kNN queries route
    through the explicit shard_map search (parallel/sharded_knn.py):
    per-shard local top-k, only ``[B, k]`` candidates cross ICI — instead of
    letting GSPMD all-gather the full ``[B, C]`` similarity row.
    """

    #: class-capacity threshold for the explicit shard_map kNN path
    shard_knn_min_classes = 1024

    def __init__(self, embedding_dim: int, config=None, mesh: Optional[Mesh] = None):
        self.mesh = mesh  # must exist before base __init__ assigns state
        self._state_sharded: Optional[MemoryState] = None
        self._sharded_topk = {}  # k → compiled shard_map search
        super().__init__(embedding_dim, config)

    @property
    def state(self) -> MemoryState:
        return self._state_sharded

    @state.setter
    def state(self, value: MemoryState):
        if self.mesh is None:
            self._state_sharded = value
            return
        specs = memory_shardings(self.mesh)
        self._state_sharded = MemoryState(
            emb=jax.device_put(value.emb, specs["emb"]),
            count=jax.device_put(value.count, specs["count"]),
            proto=jax.device_put(value.proto, specs["proto"]),
            pweight=jax.device_put(value.pweight, specs["pweight"]),
        )

    def _use_shard_knn(self) -> bool:
        if self.mesh is None or "tp" not in self.mesh.shape:
            return False
        ntp = self.mesh.shape["tp"]
        C = self.state.class_capacity
        return ntp > 1 and C >= self.shard_knn_min_classes and C % ntp == 0

    def _topk_search(self, q, k: int):
        """Swap the search core for the shard_map path above the threshold;
        the surrounding semantics (early-return, k clamp, min_similarity on
        raw scores, label assembly) stay in the single base implementation
        (memory.get_nearest_prototypes)."""
        if not self._use_shard_knn():
            return super()._topk_search(q, k)
        from .sharded_knn import make_sharded_topk

        if k not in self._sharded_topk:
            self._sharded_topk[k] = make_sharded_topk(self.mesh, k)
        return self._sharded_topk[k](q, self.state.proto, self.state.valid)


class ShardedAdaptiveClassifier(AdaptiveClassifier):
    """AdaptiveClassifier with mesh-sharded memory and head.

    >>> mesh = make_mesh(8)           # or None → all devices
    >>> clf = ShardedAdaptiveClassifier("bert-base-uncased", mesh=mesh)

    Behavior (and results) match the single-device classifier exactly —
    sharding only changes placement.
    """

    def __init__(self, model_name: str, mesh: Optional[Mesh] = None, **kwargs):
        self.mesh = mesh or make_mesh()
        super().__init__(model_name, **kwargs)
        # swap in the sharded memory (base __init__ built a plain one)
        plain = self.memory
        self.memory = ShardedPrototypeMemory(
            self.embedding_dim, config=self.config, mesh=self.mesh
        )
        self.memory.state = plain.state

    # -- head placement -------------------------------------------------
    def _head_sharding_specs(self, params) -> Any:
        from .mesh import head_shardings

        return head_shardings(self.mesh, params)

    def _place_head(self):
        if self.head_params is None:
            return
        specs = self._head_sharding_specs(self.head_params)
        self.head_params = jax.tree.map(
            lambda x, s: jax.device_put(x, s), self.head_params, specs,
            is_leaf=lambda x: isinstance(x, jax.Array),
        )

    def _initialize_adaptive_head(self):
        super()._initialize_adaptive_head()
        self._place_head()

    def _ensure_head_capacity(self):
        super()._ensure_head_capacity()
        self._place_head()

    def _train_adaptive_head(self, epochs: Optional[int] = None):
        super()._train_adaptive_head(epochs)
        self._place_head()

    def _train_new_classes(self, old_head, new_classes):
        super()._train_new_classes(old_head, new_classes)
        self._place_head()
