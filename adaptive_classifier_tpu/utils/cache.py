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
