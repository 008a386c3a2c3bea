"""Host-side embedding cache.

The reference re-runs the encoder for every text, including duplicates
(classifier.py:1249-1282 has no caching); in production serving the same
queries and training texts recur constantly.  This is a simple LRU keyed on
(text, max_length) storing the final normalized embedding rows (host numpy),
so repeat texts skip tokenize + encoder forward entirely.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import numpy as np


class EmbeddingCache:
    def __init__(self, capacity: int = 4096):
        self.capacity = capacity
        self._data: "OrderedDict[Tuple[str, int], np.ndarray]" = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def lookup(self, texts: List[str], max_length: int):
        """→ (cached [n_or_None rows], miss_indices).  Cached rows are None
        where missing."""
        out: List[Optional[np.ndarray]] = []
        misses: List[int] = []
        with self._lock:
            for i, t in enumerate(texts):
                key = (t, max_length)
                row = self._data.get(key)
                if row is None:
                    misses.append(i)
                    out.append(None)
                    self.misses += 1
                else:
                    self._data.move_to_end(key)
                    out.append(row)
                    self.hits += 1
        return out, misses

    def store(self, texts: List[str], max_length: int, rows: np.ndarray):
        if self.capacity <= 0:
            return
        with self._lock:
            for t, row in zip(texts, rows):
                self._data[(t, max_length)] = np.asarray(row)
                self._data.move_to_end((t, max_length))
            while len(self._data) > self.capacity:
                self._data.popitem(last=False)

    def clear(self):
        with self._lock:
            self._data.clear()

    def stats(self) -> Dict[str, int]:
        with self._lock:
            return {"size": len(self._data), "hits": self.hits, "misses": self.misses}


class DeviceEmbeddingCache:
    """Device-resident embedding cache: rows live in one HBM ring buffer and
    NEVER cross the host link.

    The host-side ``EmbeddingCache`` is right for CPU-adjacent use, but on a
    tunneled TPU (≈ms RTT, few-MB/s link) pulling embeddings to host to cache
    them costs far more than recomputing.  Here the host keeps only a
    text→slot dict; ``store`` writes device chunk outputs into the buffer
    device-to-device, ``gather`` returns hit rows as a device array (only the
    int32 slot indices ever upload).
    """

    def __init__(self, capacity: int, dim: int):
        import jax.numpy as jnp

        self.capacity = max(int(capacity), 1)
        self.dim = dim
        self._buf = jnp.zeros((self.capacity, dim), jnp.float32)
        self._slot_of: Dict[Tuple[str, int], int] = {}
        self._text_at: List[Optional[Tuple[str, int]]] = [None] * self.capacity
        self._next = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def lookup(self, texts: List[str], max_length: int):
        """→ (hit_pairs [(orig_index, slot)], miss_indices)."""
        hits: List[Tuple[int, int]] = []
        misses: List[int] = []
        with self._lock:
            for i, t in enumerate(texts):
                slot = self._slot_of.get((t, max_length))
                if slot is None:
                    misses.append(i)
                    self.misses += 1
                else:
                    hits.append((i, slot))
                    self.hits += 1
        return hits, misses

    def gather(self, slots: List[int]):
        """Hit rows as a device array [n, D] — indices upload, rows don't."""
        import jax.numpy as jnp

        return self._buf[jnp.asarray(slots, jnp.int32)]

    def store(self, texts: List[str], max_length: int, emb_dev):
        """Write the first ``len(texts)`` rows of ``emb_dev [m, D]`` (device)
        into ring slots, device-to-device.

        ``emb_dev`` may be a PADDED chunk (m ≥ n): padding rows scatter to the
        out-of-bounds index ``capacity`` which XLA drops, so the compiled
        shape is the chunk bucket's — variable per-call row counts never
        trigger recompiles."""
        import jax.numpy as jnp

        n = len(texts)
        if n == 0:
            return
        m = emb_dev.shape[0]
        with self._lock:
            slots = []
            for t in texts:
                s = self._next
                self._next = (self._next + 1) % self.capacity
                old = self._text_at[s]
                if old is not None:
                    self._slot_of.pop(old, None)
                self._text_at[s] = (t, max_length)
                self._slot_of[(t, max_length)] = s
                slots.append(s)
            slots += [self.capacity] * (m - n)  # OOB → dropped
            self._buf = self._buf.at[jnp.asarray(slots, jnp.int32)].set(emb_dev)

    def clear(self):
        with self._lock:
            self._slot_of.clear()
            self._text_at = [None] * self.capacity
            self._next = 0

    def stats(self) -> Dict[str, int]:
        with self._lock:
            return {"size": len(self._slot_of), "hits": self.hits, "misses": self.misses}
