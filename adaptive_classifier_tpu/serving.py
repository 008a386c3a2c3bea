"""Serving engine — micro-batching request runner for production inference.

The reference has no serving layer at all (its public surface is the Python
API plus scripts, SURVEY.md §1); a TPU deployment wants requests coalesced
into padded device batches so the chip runs large matmuls instead of B=1
forwards.  ``BatchingClassifierServer`` owns a background worker that drains
a request queue, groups requests up to ``max_batch_size`` (waiting at most
``max_wait_ms`` for stragglers), runs them through the classifier's batched
device pipeline, and resolves per-request futures.

The worker is the classifier's single writer (memory.py's concurrency
model): ``add_examples`` submitted through the server serializes with
predictions, so continual learning and serving interleave safely.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional

logger = logging.getLogger(__name__)


@dataclass
class _Request:
    kind: str                       # "predict" | "add"
    texts: List[str]
    labels: Optional[List[str]]
    k: int
    future: "Future" = field(default_factory=Future)


class BatchingClassifierServer:
    """Micro-batching front end over an AdaptiveClassifier.

    >>> server = BatchingClassifierServer(clf, max_batch_size=64, max_wait_ms=2)
    >>> server.start()
    >>> fut = server.submit_predict("some text", k=3)
    >>> fut.result()
    [("label", 0.93), ...]
    """

    def __init__(self, classifier, max_batch_size: int = 64,
                 max_wait_ms: float = 2.0):
        self.classifier = classifier
        self.max_batch_size = max_batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._held: Optional[_Request] = None  # deferred by the batch collector
        self._worker: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.batches_run = 0
        self.requests_served = 0

    # -- lifecycle ------------------------------------------------------
    def start(self):
        if self._worker is not None:
            return
        self._stop.clear()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="ac-tpu-serving")
        self._worker.start()

    def stop(self, drain: bool = True):
        if self._worker is None:
            return
        if drain:
            self._queue.join()
        self._stop.set()
        self._queue.put(None)  # wake the worker
        self._worker.join(timeout=10)
        self._worker = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    # -- submission -----------------------------------------------------
    def submit_predict(self, text: str, k: int = 5) -> "Future":
        req = _Request("predict", [text], None, k)
        self._queue.put(req)
        return req.future

    def predict(self, text: str, k: int = 5, timeout: Optional[float] = None):
        return self.submit_predict(text, k).result(timeout=timeout)

    def submit_add_examples(self, texts: List[str], labels: List[str]) -> "Future":
        req = _Request("add", list(texts), list(labels), 0)
        self._queue.put(req)
        return req.future

    # -- worker ---------------------------------------------------------
    def _collect(self) -> List[_Request]:
        """Block for one request, then coalesce more until the batch fills
        or max_wait elapses.  Training requests act as batch barriers
        (single-writer model): a mixed pickup defers the odd one out to the
        holdover slot for the next batch."""
        if self._held is not None:
            first, self._held = self._held, None
        else:
            first = self._queue.get()
            if first is None:
                self._queue.task_done()  # balance the sentinel's put()
                return []
        batch = [first]
        if first.kind != "predict":
            return batch
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.task_done()  # balance the sentinel's put()
                break
            if nxt.kind != "predict":
                self._held = nxt
                break
            batch.append(nxt)
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                if batch[0].kind == "add":
                    req = batch[0]
                    try:
                        self.classifier.add_examples(req.texts, req.labels)
                        req.future.set_result(True)
                    except Exception as e:
                        req.future.set_exception(e)
                    finally:
                        self._queue.task_done()
                    continue

                texts = [r.texts[0] for r in batch]
                k = max(r.k for r in batch)
                try:
                    results = self.classifier.predict_batch(
                        texts, k=k, batch_size=self.max_batch_size
                    )
                    for r, res in zip(batch, results):
                        r.future.set_result(res[: r.k])
                except Exception as e:
                    for r in batch:
                        if not r.future.done():
                            r.future.set_exception(e)
                finally:
                    for _ in batch:
                        self._queue.task_done()
                self.batches_run += 1
                self.requests_served += len(batch)
            except Exception:  # pragma: no cover — keep the worker alive
                logger.exception("serving worker error")

    # -- introspection --------------------------------------------------
    def stats(self) -> dict:
        return {
            "batches_run": self.batches_run,
            "requests_served": self.requests_served,
            "mean_batch_size": (
                self.requests_served / self.batches_run if self.batches_run else 0.0
            ),
            "queue_depth": self._queue.qsize(),
        }
