"""Serving engine tests: micro-batching, correctness vs direct predict,
interleaved training, worker lifecycle."""

import threading
import time

import numpy as np
import pytest

from adaptive_classifier_tpu.serving import BatchingClassifierServer


@pytest.fixture(scope="module")
def server_clf(synth_classifier_factory):
    clf = synth_classifier_factory()
    clf.add_examples([f"cat:{i}" for i in range(6)] + [f"dog:{i}" for i in range(6)],
                     ["cat"] * 6 + ["dog"] * 6)
    return clf


def test_predict_matches_direct(server_clf):
    direct = server_clf.predict_batch(["cat:77"], k=2)[0]
    with BatchingClassifierServer(server_clf, max_wait_ms=1) as server:
        served = server.predict("cat:77", k=2, timeout=30)
    assert served[0][0] == direct[0][0]
    assert abs(served[0][1] - direct[0][1]) < 1e-6


def test_concurrent_requests_batched(server_clf):
    with BatchingClassifierServer(server_clf, max_batch_size=32, max_wait_ms=20) as server:
        futures = [
            server.submit_predict(f"cat:{i}" if i % 2 == 0 else f"dog:{i}", k=1)
            for i in range(24)
        ]
        results = [f.result(timeout=60) for f in futures]
    for i, res in enumerate(results):
        expected = "cat" if i % 2 == 0 else "dog"
        assert res[0][0] == expected
    stats = server.stats()
    assert stats["requests_served"] == 24
    # coalescing actually happened (fewer batches than requests)
    assert stats["batches_run"] < 24
    assert stats["mean_batch_size"] > 1.0


def test_add_examples_interleaved(server_clf):
    with BatchingClassifierServer(server_clf, max_wait_ms=1) as server:
        fut = server.submit_add_examples([f"bird:{i}" for i in range(6)], ["bird"] * 6)
        assert fut.result(timeout=120) is True
        res = server.predict("bird:99", k=3, timeout=60)
    assert res[0][0] == "bird"


def test_per_request_k(server_clf):
    with BatchingClassifierServer(server_clf, max_wait_ms=10) as server:
        f1 = server.submit_predict("cat:5", k=1)
        f2 = server.submit_predict("dog:5", k=2)
        r1, r2 = f1.result(timeout=30), f2.result(timeout=30)
    assert len(r1) == 1
    assert len(r2) == 2


def test_stop_and_restart(server_clf):
    server = BatchingClassifierServer(server_clf, max_wait_ms=1)
    server.start()
    assert server.predict("cat:1", k=1, timeout=30)
    server.stop()
    server.start()
    assert server.predict("dog:1", k=1, timeout=30)
    server.stop()
