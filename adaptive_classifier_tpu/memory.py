"""Prototype memory — padded device buffers + jitted state transitions.

TPU-native re-design of the reference's ``PrototypeMemory``
(reference: src/adaptive_classifier/memory.py:11-295).  The reference keeps
Python lists of per-class examples plus a host-side FAISS index that must be
rebuilt as classes change.  Here all example embeddings live in one
fixed-capacity padded device buffer ``[C, E, D]``; prototypes are masked means
recomputed on device; "index rebuild" does not exist (kNN always reads the
current prototype matrix).  Class and example capacities grow in coarse
buckets so runtime class addition never recompiles per class.

Semantics preserved from the reference:
- prototype = mean of stored example embeddings (memory.py:148-153);
- similarity = exp(−‖q−p‖²) then softmax over returned neighbors
  (memory.py:117-134) — implemented in ops/knn.py;
- capacity pruning keeps the examples closest to the class mean
  (memory.py:196-217), including their distance-sorted order;
- ``get_nearest_prototypes`` returns [] when no prototypes exist.

Concurrency: the reference's memory has no locks and survives threaded use
only by grace of the GIL (tests/test_memory.py:226-256).  Here every mutation
is a pure ``state → state'`` function applied by a single host writer; readers
always see a consistent device state snapshot.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .config import Example, ModelConfig
from .ops import knn, knn_topk

logger = logging.getLogger(__name__)


@struct.dataclass
class MemoryState:
    """Device-resident memory: example buffer, counts, prototypes."""

    emb: jax.Array      # [C, E, D] float32 — example embeddings (padded)
    count: jax.Array    # [C] int32 — valid examples per class row
    proto: jax.Array    # [C, D] float32 — running mean per class row
    #: [C] float32 — number of embeddings aggregated into ``proto``.  After a
    #: load this can EXCEED ``count``: checkpoints keep only ~5
    #: representative examples/class (reference classifier.py:559-566) while
    #: the restored prototype is the exact build-time mean over every example
    #: the class ever saw (weight = training_history).  Running-mean updates
    #: against this weight are what keep that information alive — a full
    #: recompute from the lossy buffer on the next ``add`` was measured to
    #: drop a loaded 4-class zoo checkpoint's prototype-only accuracy from
    #: 0.70 to 0.43 (every class's prototype drifted ~0.4 L2 from one
    #: unrelated add).
    pweight: jax.Array

    @property
    def class_capacity(self) -> int:
        return self.emb.shape[0]

    @property
    def example_capacity(self) -> int:
        return self.emb.shape[1]

    @property
    def dim(self) -> int:
        return self.emb.shape[2]

    @property
    def valid(self) -> jax.Array:
        return self.count > 0


def init_state(class_capacity: int, example_capacity: int, dim: int) -> MemoryState:
    return MemoryState(
        emb=jnp.zeros((class_capacity, example_capacity, dim), jnp.float32),
        count=jnp.zeros((class_capacity,), jnp.int32),
        proto=jnp.zeros((class_capacity, dim), jnp.float32),
        pweight=jnp.zeros((class_capacity,), jnp.float32),
    )


# ---------------------------------------------------------------------------
# jitted state transitions
# ---------------------------------------------------------------------------

@jax.jit
def recompute_prototypes(state: MemoryState) -> MemoryState:
    """Prototype = masked mean over stored examples (memory.py:148-153).

    Resets ``pweight`` to the buffer count: a recompute derives the
    prototype from the stored rows alone, discarding any loaded exact
    prototype — only prune/reembed/restore flows (where the buffer IS the
    source of truth) should call this.
    """
    C, E, _ = state.emb.shape
    mask = (jnp.arange(E)[None, :] < state.count[:, None]).astype(jnp.float32)
    sums = jnp.einsum("ce,ced->cd", mask, state.emb)
    denom = jnp.maximum(state.count.astype(jnp.float32), 1.0)[:, None]
    return state.replace(proto=sums / denom,
                         pweight=state.count.astype(jnp.float32))


@jax.jit
def add_batch(state: MemoryState, emb: jax.Array, cls: jax.Array) -> MemoryState:
    """Append a batch of embeddings to their class rows, in order.

    ``cls`` is int32 with −1 marking padding rows.  Position of example *i* is
    ``count[cls_i]`` plus the number of earlier batch items of the same class,
    so within-call order matches the reference's sequential appends
    (classifier.py:156-158).
    """
    C = state.emb.shape[0]
    valid = cls >= 0
    # padding rows scatter to out-of-bounds class C: JAX drops out-of-bounds
    # updates (scatter mode "drop"), so they can never collide with a valid
    # row's slot regardless of XLA scatter ordering
    safe_cls = jnp.where(valid, cls, C)
    # rank of each item within its class inside this batch
    same = (cls[None, :] == cls[:, None]) & valid[None, :] & valid[:, None]
    earlier = jnp.tril(same, k=-1)
    rank = jnp.sum(earlier, axis=1)
    pos = state.count[jnp.where(valid, cls, 0)] + rank
    pos = jnp.clip(pos, 0, state.example_capacity - 1)
    new_emb = state.emb.at[safe_cls, pos].set(emb)
    adds = jnp.zeros_like(state.count).at[safe_cls].add(valid.astype(jnp.int32))
    new_count = jnp.minimum(state.count + adds, state.example_capacity)
    # RUNNING-MEAN prototype update for the touched classes only — never a
    # full recompute from the buffer.  The reference updates only the added
    # class (memory.py:68 → :138-159); we additionally weight by ``pweight``
    # so that after a lossy load (5 representative rows/class) the exact
    # checkpointed prototype keeps its full build-time aggregate instead of
    # being flattened onto the survivors.  For a never-saved classifier
    # pweight == count and this equals the masked mean exactly.
    sums = jnp.zeros_like(state.proto).at[safe_cls].add(
        jnp.where(valid[:, None], emb, 0.0))
    adds_f = adds.astype(jnp.float32)
    new_pw = state.pweight + adds_f
    new_proto = jnp.where(
        (adds > 0)[:, None],
        (state.proto * state.pweight[:, None] + sums)
        / jnp.maximum(new_pw, 1.0)[:, None],
        state.proto,
    )
    return state.replace(emb=new_emb, count=new_count,
                         proto=new_proto, pweight=new_pw)


@functools.partial(jax.jit, static_argnames=("max_examples",))
def prune(state: MemoryState, max_examples: int) -> Tuple[MemoryState, jax.Array]:
    """Keep the ``max_examples`` embeddings closest to each class mean.

    Mirrors memory.py:196-217 including the resulting distance-sorted order.
    Returns ``(state, order [C, E] int32)`` — the per-class keep order so the
    host can realign its text lists (order[c, j] = old row index now at j).
    """
    C, E, D = state.emb.shape
    mask = jnp.arange(E)[None, :] < state.count[:, None]
    mean = recompute_prototypes(state).proto                     # [C, D]
    diff = state.emb - mean[:, None, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    dist = jnp.where(mask, dist, jnp.inf)
    order = jnp.argsort(dist, axis=1, stable=True)               # [C, E]
    gathered = jnp.take_along_axis(state.emb, order[:, :, None], axis=1)
    keep_n = jnp.minimum(state.count, max_examples)
    keep_mask = jnp.arange(E)[None, :] < keep_n[:, None]
    new_emb = jnp.where(keep_mask[:, :, None], gathered, 0.0)
    pruned = keep_n < state.count
    state = state.replace(emb=new_emb, count=keep_n)
    # reference recomputes the PRUNED class's prototype over survivors
    # (memory.py:196-217 → :138-159); untouched classes keep their running
    # prototype (after a load that is the exact checkpointed one)
    rec = recompute_prototypes(state)
    return state.replace(
        proto=jnp.where(pruned[:, None], rec.proto, state.proto),
        pweight=jnp.where(pruned, rec.pweight, state.pweight),
    ), order


@functools.partial(jax.jit, static_argnames=("slot",))
def clear_class(state: MemoryState, slot: int) -> MemoryState:
    state = state.replace(
        emb=state.emb.at[slot].set(0.0),
        count=state.count.at[slot].set(0),
        proto=state.proto.at[slot].set(0.0),
        pweight=state.pweight.at[slot].set(0.0),
    )
    return state


@functools.partial(jax.jit, static_argnames=("n_cap",))
def gather_training_set(
    state: MemoryState, n_cap: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compact all stored examples into a flat training set.

    Returns ``(emb [n_cap, D], labels [n_cap] int32, valid [n_cap] bool)``
    with real rows sorted to the front in class-major order.  This is the
    device analog of the reference's example-gathering loops
    (classifier.py:1433-1447) — one stable sort + gather, no host traffic.
    """
    C, E, D = state.emb.shape
    mask = jnp.arange(E)[None, :] < state.count[:, None]            # [C, E]
    flat_valid = mask.reshape(-1)
    flat_labels = jnp.broadcast_to(jnp.arange(C)[:, None], (C, E)).reshape(-1)
    order = jnp.argsort(jnp.logical_not(flat_valid), stable=True)[:n_cap]
    emb = state.emb.reshape(C * E, D)[order]
    return emb, flat_labels[order].astype(jnp.int32), flat_valid[order]


# ---------------------------------------------------------------------------
# host facade
# ---------------------------------------------------------------------------

class PrototypeMemory:
    """Host shell owning the device MemoryState + label/text bookkeeping.

    API mirrors the reference class (memory.py:11) — ``add_example``,
    ``get_nearest_prototypes``, ``clear``, ``get_stats`` — while the heavy
    state lives on device.  Texts stay host-side, aligned row-for-row with the
    device example buffer.
    """

    def __init__(self, embedding_dim: int, config: Optional[ModelConfig] = None):
        import threading

        self.embedding_dim = embedding_dim
        self.config = config or ModelConfig()
        # the reference has no locks and survives threaded adds only by
        # grace of the GIL (tests/test_memory.py:226-256); here mutations are
        # explicitly serialized so host bookkeeping and device state can
        # never diverge under concurrent writers.  Re-entrant: public
        # mutators take it and may call locked helpers.
        self._write_lock = threading.RLock()
        self.label_to_index: Dict[str, int] = {}
        self.index_to_label: Dict[int, str] = {}
        self.texts: Dict[str, List[str]] = {}
        self.strategic_prototypes: Dict[str, np.ndarray] = {}
        self.updates_since_rebuild = 0  # kept for stats parity; no rebuild exists
        self.state = init_state(
            self.config.class_capacity(1),
            self.config.example_capacity(1),
            embedding_dim,
        )

    # -- capacity ------------------------------------------------------
    def _ensure_capacity(self, num_classes: int, max_count: int):
        C_need = self.config.class_capacity(num_classes)
        E_need = self.config.example_capacity(max_count)
        C, E, D = self.state.emb.shape
        if C_need > C or E_need > E:
            C_new, E_new = max(C_need, C), max(E_need, E)
            emb = jnp.zeros((C_new, E_new, D), jnp.float32)
            emb = emb.at[:C, :E].set(self.state.emb)
            count = jnp.zeros((C_new,), jnp.int32).at[:C].set(self.state.count)
            proto = jnp.zeros((C_new, D), jnp.float32).at[:C].set(self.state.proto)
            pweight = jnp.zeros((C_new,), jnp.float32).at[:C].set(self.state.pweight)
            self.state = MemoryState(emb=emb, count=count, proto=proto,
                                     pweight=pweight)
            logger.debug(f"Memory grown to C={C_new}, E={E_new}")

    def _slot(self, label: str) -> int:
        with self._write_lock:
            if label not in self.label_to_index:
                idx = len(self.label_to_index)
                self._ensure_capacity(idx + 1, 1)
                self.label_to_index[label] = idx
                self.index_to_label[idx] = label
                self.texts[label] = []
            return self.label_to_index[label]

    def register_label(self, label: str) -> int:
        """Pre-register a label so memory slot ids equal classifier label ids.

        The classifier assigns ids alphabetically among new classes
        (reference classifier.py:146-150) and registers them here in that
        order before adding examples."""
        return self._slot(label)

    def _counts_host(self) -> Dict[str, int]:
        return {lbl: len(ts) for lbl, ts in self.texts.items()}

    # -- mutation ------------------------------------------------------
    def add_example(self, example: Example, label: str):
        """Single-example add (reference memory.py:41-83)."""
        if example.embedding is None:
            raise ValueError("Example must have an embedding")
        emb = np.asarray(example.embedding, dtype=np.float32).reshape(-1)
        if emb.shape[-1] != self.embedding_dim:
            raise ValueError(
                f"Example embedding dimension {emb.shape[-1]} "
                f"does not match memory dimension {self.embedding_dim}"
            )
        self.add_batch_host([example.text], emb[None, :], [label])

    def add_batch_host(self, texts: List[str], embs: np.ndarray, labels: List[str]):
        """Batched device append + prune; keeps host text lists aligned.

        The buffer holds ``max_examples_per_class + slack`` rows at most;
        appends land in the slack region and the prune step (keep closest to
        mean, memory.py:196-217) runs whenever a class exceeds the cap, so no
        chunk can overflow the device buffer.
        """
        with self._write_lock:
            self._add_batch_locked(texts, embs, labels)

    def _add_batch_locked(self, texts: List[str], embs: np.ndarray, labels: List[str]):
        slots = np.asarray([self._slot(l) for l in labels], dtype=np.int32)
        counts = self._counts_host()
        adds_per_label = {l: labels.count(l) for l in set(labels)}
        max_after = max(
            (counts.get(l, 0) + n for l, n in adds_per_label.items()), default=1
        )
        self._ensure_capacity(len(self.label_to_index), max_after)

        E = self.state.example_capacity
        max_ex = min(self.config.max_examples_per_class, E)
        if E <= max_ex and self.config.example_capacity(E + 1) <= E and E > 1:
            # the buffer is at its bucket ceiling AND cannot grow: reserve
            # one slack row, else add_batch clips appends onto row E-1 and
            # silently overwrites a stored example (text↔embedding desync)
            max_ex = E - 1
        headroom = max(E - max_ex, 1)
        chunk = max(1, min(max(self.config.example_capacity_slack, 1), headroom))
        for s in range(0, len(labels), chunk):
            cs = slice(s, s + chunk)
            self.state = add_batch(
                self.state,
                jnp.asarray(embs[cs], jnp.float32),
                jnp.asarray(slots[cs]),
            )
            for t, l in zip(texts[cs], labels[cs]):
                self.texts[l].append(t)
            self.updates_since_rebuild += len(labels[cs])
            if any(len(self.texts[l]) > max_ex for l in set(labels[cs])):
                self._prune(max_ex)
        if self.updates_since_rebuild >= self.config.prototype_update_frequency:
            self.updates_since_rebuild = 0

    def _prune(self, max_ex: Optional[int] = None):
        max_ex = max_ex if max_ex is not None else self.config.max_examples_per_class
        self.state, order = prune(self.state, max_ex)
        order_np = np.asarray(order)
        # the jitted prune distance-sorts EVERY class's device rows, not just
        # overflowing ones — realign every stored text list to the new order
        # so text↔embedding pairing survives (bug fix: under-capacity classes
        # previously kept insertion order while device rows were reordered)
        for label, slot in self.label_to_index.items():
            ts = self.texts[label]
            if ts:
                keep = order_np[slot, : min(len(ts), max_ex)]
                self.texts[label] = [ts[i] for i in keep if i < len(ts)]

    def reembed(self, embed_fn):
        """Recompute every stored embedding with a new embedding function.

        Encoder fine-tuning (classifier.finetune_encoder) invalidates all
        stored vectors; this rebuilds the device buffers from the host text
        lists while keeping label registrations, so memory slot ids keep
        matching classifier label ids.  No reference analog — the
        reference's encoder is frozen forever, so its memory never goes
        stale (SURVEY.md §2.1 PrototypeMemory)."""
        with self._write_lock:
            texts_by_label = {l: list(ts) for l, ts in self.texts.items()}
            C, E, D = self.state.emb.shape
            self.state = init_state(C, E, D)
            self.strategic_prototypes.clear()
            all_texts: List[str] = []
            all_labels: List[str] = []
            for l, ts in texts_by_label.items():
                self.texts[l] = []
                all_texts += ts
                all_labels += [l] * len(ts)
            if all_texts:
                embs = np.asarray(embed_fn(all_texts), np.float32)
                self._add_batch_locked(all_texts, embs, all_labels)

    def clear(self):
        """Reference memory.py:238-245."""
        with self._write_lock:
            C, E, D = self.state.emb.shape
            self.state = init_state(C, E, D)
            self.label_to_index.clear()
            self.index_to_label.clear()
            self.texts.clear()
            self.strategic_prototypes.clear()
            self.updates_since_rebuild = 0

    def remove_label(self, label: str):
        with self._write_lock:
            if label not in self.label_to_index:
                return
            slot = self.label_to_index[label]
            self.state = clear_class(self.state, slot)
            self.texts[label] = []

    # -- queries -------------------------------------------------------
    def sims_for(self, queries: jax.Array) -> jax.Array:
        """Masked exp(−d²) similarities [B, C] against current prototypes."""
        return knn.masked_sims(
            queries, self.state.proto, self.state.valid,
            pallas_min_classes=self.config.pallas_knn_min_classes,
        )

    def _topk_search(self, q: jax.Array, k: int):
        """→ (scores [1,k], idx [1,k], raw [1,k]); overridable search core
        (ShardedPrototypeMemory swaps in the shard_map path)."""
        # large indexes route through the two-stage fused top-k kernel
        # (ops/knn_topk.py) — the [1, C] similarity row never materializes
        return knn_topk.topk_scores_auto(
            q, self.state.proto, self.state.valid, k,
            fused_min_classes=self.config.fused_topk_min_classes,
            return_raw=True,
        )

    def get_nearest_prototypes(
        self,
        query_embedding,
        k: int = 5,
        min_similarity: Optional[float] = None,
    ) -> List[Tuple[str, float]]:
        """Reference memory.py:85-136 — list of (label, softmax score)."""
        counts = self._counts_host()
        n_valid = sum(1 for v in counts.values() if v > 0)
        if n_valid == 0:
            return []
        k = min(k, n_valid)
        q = jnp.asarray(np.asarray(query_embedding, np.float32)).reshape(1, -1)
        scores, idx, raw = self._topk_search(q, k)
        scores = np.asarray(scores[0])
        idx = np.asarray(idx[0])
        # min_similarity thresholds the RAW exp(−d²) similarity (the scale the
        # parameter is named for), not the post-softmax score — the softmaxed
        # scores sum to 1 over k and are returned as before.  (The reference
        # accepts this parameter but never applies it, memory.py:85-136; we
        # implement it with raw-similarity semantics and document the
        # deviation in docs/PARITY.md.)
        raw = np.asarray(raw[0])
        results = []
        for pos, (i, s) in enumerate(zip(idx, scores)):
            if i >= 0:
                if min_similarity is not None and raw[pos] < min_similarity:
                    continue
                results.append((self.index_to_label[int(i)], float(s)))
        return results

    @property
    def prototypes(self) -> Dict[str, np.ndarray]:
        """Host view of valid prototypes (labels with ≥1 example)."""
        proto = np.asarray(self.state.proto)
        return {
            lbl: proto[slot]
            for lbl, slot in self.label_to_index.items()
            if len(self.texts.get(lbl, ())) > 0
        }

    @property
    def examples(self) -> Dict[str, List[Example]]:
        """Host view reconstructing Example objects (reference-compatible)."""
        emb = np.asarray(self.state.emb)
        out: Dict[str, List[Example]] = {}
        for lbl, slot in self.label_to_index.items():
            ts = self.texts.get(lbl, [])
            if ts:
                out[lbl] = [
                    Example(t, lbl, emb[slot, i].copy()) for i, t in enumerate(ts)
                ]
        return out

    def class_embeddings(self, label: str) -> np.ndarray:
        slot = self.label_to_index[label]
        n = len(self.texts.get(label, ()))
        return np.asarray(self.state.emb[slot, :n])

    def get_stats(self) -> Dict[str, Any]:
        """Reference memory.py:219-236."""
        counts = self._counts_host()
        return {
            "num_classes": sum(1 for v in counts.values() if v > 0),
            "examples_per_class": {l: c for l, c in counts.items() if c > 0},
            "total_examples": sum(counts.values()),
            "prototype_dimensions": self.embedding_dim,
            "updates_since_rebuild": self.updates_since_rebuild,
        }

    def restore_class(self, label: str, texts: List[str], embs: np.ndarray,
                      prototype: Optional[np.ndarray] = None,
                      prototype_weight: Optional[float] = None):
        """Load-path restore: install examples and (optionally) an exact saved
        prototype (reference classifier.py:879-895).

        The reference restores prototypes from the checkpoint rather than
        recomputing from the (lossy, k-means-selected) saved examples, so
        predictions stay consistent across save/load.  ``prototype_weight``
        is how many embeddings the saved prototype aggregates (the
        classifier passes its persisted ``training_history`` count): future
        ``add_batch`` running-mean updates fold new examples in at that
        weight instead of flattening the prototype onto the ~5 surviving
        representative rows.
        """
        with self._write_lock:
            return self._restore_class_locked(label, texts, embs, prototype,
                                              prototype_weight)

    def _restore_class_locked(self, label, texts, embs, prototype,
                              prototype_weight=None):
        slot = self._slot(label)
        n = len(texts)
        self._ensure_capacity(len(self.label_to_index), max(n, 1))
        self.texts[label] = list(texts)
        if n > 0:
            self.state = self.state.replace(
                emb=self.state.emb.at[slot, :n].set(jnp.asarray(embs, jnp.float32)),
                count=self.state.count.at[slot].set(n),
            )
        elif prototype is not None:
            # prototype with no surviving examples: store the prototype as the
            # single stored row so it stays searchable and future means are
            # seeded from it rather than a zeros row
            self.texts[label] = [f"<prototype:{label}>"]
            self.state = self.state.replace(
                emb=self.state.emb.at[slot, 0].set(jnp.asarray(prototype, jnp.float32)),
                count=self.state.count.at[slot].set(1),
            )
            n = 1
        # SLOT-LOCAL prototype update only: recomputing the whole state here
        # would overwrite previously-restored classes' exact checkpointed
        # prototypes with the mean of their (lossy, k-means-selected) saved
        # examples and silently drift predictions across a save/load
        if prototype is not None:
            new_proto = jnp.asarray(prototype, jnp.float32)
        elif n > 0:
            new_proto = jnp.mean(jnp.asarray(embs[:n], jnp.float32), axis=0)
        else:
            new_proto = self.state.proto[slot]
        weight = float(max(prototype_weight or 0, n))
        self.state = self.state.replace(
            proto=self.state.proto.at[slot].set(new_proto),
            pweight=self.state.pweight.at[slot].set(weight),
        )

    # -- strategic prototypes (reference memory.py:247-295) -------------
    def compute_strategic_prototypes(self, cost_function, classifier_func):
        """Mean of best-response embeddings per class (memory.py:247-268),
        computed as one vmapped batch per class instead of a Python loop."""
        for label, slot in self.label_to_index.items():
            n = len(self.texts.get(label, ()))
            if n == 0:
                continue
            embs = self.state.emb[slot, :n]
            moved = cost_function.compute_best_response_batch(embs, classifier_func)
            self.strategic_prototypes[label] = np.asarray(jnp.mean(moved, axis=0))

    def get_strategic_prototypes(self, query_embedding, k: int = 5) -> List[Tuple[str, float]]:
        """Cosine-similarity ranking against strategic prototypes
        (memory.py:270-295; the reference version has a latent NameError —
        it uses ``F.cosine_similarity`` without importing F — fixed here)."""
        if not self.strategic_prototypes:
            return self.get_nearest_prototypes(query_embedding, k)
        q = np.asarray(query_embedding, np.float32).reshape(-1)
        qn = q / max(float(np.linalg.norm(q)), 1e-12)
        sims = []
        for label, proto in self.strategic_prototypes.items():
            p = proto / max(float(np.linalg.norm(proto)), 1e-12)
            sims.append((label, float(np.dot(qn, p))))
        sims.sort(key=lambda x: x[1], reverse=True)
        return sims[:k]
