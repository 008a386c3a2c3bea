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


# ---------------------------------------------------------------------------
# QoS tier (round 2): priorities, deadlines/shedding, multi-tenancy
# ---------------------------------------------------------------------------

def test_priority_orders_queued_work(server_clf):
    """With the worker busy, a high-priority request leapfrogs the backlog."""
    from adaptive_classifier_tpu.serving import _PriorityChannel, _Request

    chan = _PriorityChannel()
    order = []
    for i, prio in enumerate([0, 0, 5, 1]):
        chan.put(_Request("predict", "default", [f"t{i}"], None, 1, priority=prio))
    while chan.qsize():
        order.append(chan.get().texts[0])
    assert order == ["t2", "t3", "t0", "t1"]  # prio desc, FIFO within level


def test_deadline_expired_requests_are_shed(server_clf):
    from adaptive_classifier_tpu.serving import DeadlineExceeded

    server = BatchingClassifierServer(server_clf, max_wait_ms=1)
    # enqueue BEFORE starting the worker so the deadline lapses in queue
    fut = server.submit_predict("cat:1", k=1, deadline_ms=5)
    time.sleep(0.05)
    server.start()
    with pytest.raises(DeadlineExceeded):
        fut.result(timeout=30)
    assert server.requests_expired == 1
    live = server.submit_predict("cat:2", k=1, deadline_ms=60_000)
    assert live.result(timeout=30)[0][0] == "cat"
    server.stop()


def test_overload_shedding_at_admission(server_clf):
    from adaptive_classifier_tpu.serving import ServerOverloaded

    server = BatchingClassifierServer(server_clf, max_queue_depth=2)
    # worker not started: queue fills to the cap, then sheds
    f1 = server.submit_predict("cat:1", k=1)
    f2 = server.submit_predict("cat:2", k=1)
    f3 = server.submit_predict("cat:3", k=1)
    with pytest.raises(ServerOverloaded):
        f3.result(timeout=1)
    assert server.requests_shed == 1
    server.start()
    assert f1.result(timeout=30)[0][0] == "cat"
    assert f2.result(timeout=30)[0][0] == "cat"
    server.stop()


def test_backpressure_engages_under_live_overload(server_clf):
    """The round-4 bench failure mode, exercised on purpose: a live server
    offered far more than it can drain must SHED at admission (bounded
    queue) rather than build a standing queue — and every request must
    resolve one way or the other (served, shed, or expired; never hung)."""
    from adaptive_classifier_tpu.serving import (
        DeadlineExceeded, ServerOverloaded)

    server = BatchingClassifierServer(server_clf, max_batch_size=4,
                                      max_wait_ms=1, max_queue_depth=8,
                                      num_workers=1)
    with server:
        n = 200
        futs = [server.submit_predict(f"cat:{i}", k=1, deadline_ms=30_000)
                for i in range(n)]
        served = shed = expired = 0
        for f in futs:
            exc = f.exception(timeout=60)
            if exc is None:
                served += 1
            elif isinstance(exc, ServerOverloaded):
                shed += 1
            elif isinstance(exc, DeadlineExceeded):
                expired += 1
            else:  # pragma: no cover
                raise exc
        assert served + shed + expired == n
        assert shed > 0, "admission control never engaged under overload"
        assert served > 0
        # the queue is bounded — at most depth + one in-flight batch ever
        # waits, so the standing-queue signature (everything served, all
        # with ~equal worst-case latency) is structurally impossible
        assert server.requests_shed == shed
        assert server.stats()["queue_depth"] == 0


def test_multi_tenant_routes_by_model(synth_classifier_factory):
    from adaptive_classifier_tpu.serving import MultiTenantServer

    clf_a = synth_classifier_factory()
    clf_a.add_examples([f"cat:{i}" for i in range(4)] + [f"dog:{i}" for i in range(4)],
                       ["cat"] * 4 + ["dog"] * 4)
    clf_b = synth_classifier_factory()
    clf_b.add_examples([f"spam:{i}" for i in range(4)] + [f"ham:{i}" for i in range(4)],
                       ["spam"] * 4 + ["ham"] * 4)

    with MultiTenantServer({"animals": clf_a, "mail": clf_b}, max_wait_ms=5) as server:
        fa = [server.submit_predict(f"cat:{i+10}", k=1, model="animals") for i in range(3)]
        fb = [server.submit_predict(f"spam:{i+10}", k=1, model="mail") for i in range(3)]
        assert all(f.result(timeout=60)[0][0] == "cat" for f in fa)
        assert all(f.result(timeout=60)[0][0] == "spam" for f in fb)
        bad = server.submit_predict("x", model="nope")
        with pytest.raises(KeyError):
            bad.result(timeout=1)
    stats = server.stats()
    assert stats["requests_served"] == 6
    assert stats["models"] == ["animals", "mail"]


def test_multi_tenant_add_model_and_training(synth_classifier_factory):
    from adaptive_classifier_tpu.serving import MultiTenantServer

    clf_a = synth_classifier_factory()
    clf_a.add_examples(["cat:0", "dog:0", "cat:1", "dog:1"],
                       ["cat", "dog", "cat", "dog"])
    server = MultiTenantServer({"animals": clf_a})
    server.start()
    clf_b = synth_classifier_factory()
    server.add_model("colors", clf_b)
    add = server.submit_add_examples(
        ["red:0", "blue:0", "red:1", "blue:1"],
        ["red", "blue", "red", "blue"], model="colors")
    assert add.result(timeout=60) is True
    res = server.submit_predict("red:7", k=1, model="colors").result(timeout=60)
    assert res[0][0] == "red"
    with pytest.raises(ValueError):
        server.add_model("animals", clf_b)
    server.stop()


def test_prediction_modes(synth_classifier_factory):
    """mode='robust'/'strategic'/'dual' route through the batched strategic
    entry points; batches never mix modes; unknown modes error."""
    clf = synth_classifier_factory(config={
        "enable_strategic_mode": True,
        "cost_function_type": "linear",
        "cost_coefficients": [0.1] * 128,
    })
    clf.add_examples([f"alpha:{i}" for i in range(6)] + [f"beta:{i}" for i in range(6)],
                     ["alpha"] * 6 + ["beta"] * 6)
    with BatchingClassifierServer(clf, max_wait_ms=5) as server:
        direct = clf.predict_robust("alpha:query", 2)
        served = server.predict("alpha:query", k=2, mode="robust")
        assert [l for l, _ in served] == [l for l, _ in direct]
        for (_, a), (_, b) in zip(served, direct):
            assert abs(a - b) < 1e-5
        strat = server.predict("beta:query", k=2, mode="strategic")
        assert strat and all(isinstance(l, str) for l, _ in strat)
        dual = server.predict("alpha:query", k=2, mode="dual")
        assert dual and len(dual) <= 2
        # mixed-mode burst: every request gets a valid result
        futs = [server.submit_predict(f"alpha:{i}", k=1,
                                      mode=("robust" if i % 2 else "regular"))
                for i in range(8)]
        assert all(f.result(timeout=30) for f in futs)
        import pytest
        with pytest.raises(ValueError, match="unknown mode"):
            server.predict("alpha:x", mode="telepathy")


def test_multi_worker_consistency_and_write_exclusion(synth_classifier_factory):
    """num_workers>1: predict batches run concurrently under the shared
    RW lock, results match the direct path, and an interleaved
    add_examples (write-exclusive) lands without corrupting either side
    (round-4 serving-capacity work)."""
    clf = synth_classifier_factory()
    clf.add_examples([f"cat:{i}" for i in range(6)] + [f"dog:{i}" for i in range(6)],
                     ["cat"] * 6 + ["dog"] * 6)
    ref = {t: clf.predict_batch([t], k=1)[0][0][0]
           for t in ["cat:77", "dog:88"]}
    with BatchingClassifierServer(clf, max_batch_size=8, max_wait_ms=2,
                                  num_workers=3) as srv:
        futs = [srv.submit_predict("cat:77" if i % 2 == 0 else "dog:88", k=1)
                for i in range(60)]
        addf = srv.submit_add_examples([f"bird:{i}" for i in range(4)],
                                       ["bird"] * 4)
        futs2 = [srv.submit_predict(f"bird:{i}", k=1) for i in range(8)]
        for i, f in enumerate(futs):
            want = ref["cat:77"] if i % 2 == 0 else ref["dog:88"]
            assert f.result(timeout=60)[0][0] == want
        assert addf.result(timeout=60) is True
        assert all(f.result(timeout=60) for f in futs2)
    assert clf.predict("bird:1", k=1)[0][0] == "bird"


def test_predict_batch_size_invariance(synth_classifier_factory):
    """predict_batch must return (near-)identical results regardless of
    how the batch splits into padded device chunks — the padded-drain
    rewrite keeps chunks at bucketed shapes and drops padding rows on
    host (per-batch-size recompile fix, round 4)."""
    clf = synth_classifier_factory(config={"embedding_cache_size": 0})
    clf.add_examples([f"cat:{i}" for i in range(6)] + [f"dog:{i}" for i in range(6)],
                     ["cat"] * 6 + ["dog"] * 6)
    texts = [("cat:q%d" if i % 2 else "dog:q%d") % i for i in range(33)]
    ref = clf.predict_batch(texts, k=2)
    for n in (1, 3, 7, 20, 33):
        out = clf.predict_batch(texts[:n], k=2)
        for a, b in zip(out, ref):
            assert [l for l, _ in a] == [l for l, _ in b]
            assert all(abs(x - y) < 1e-3 for (_, x), (_, y) in zip(a, b))
    out = clf.predict_batch(texts[:10], k=2, batch_size=4)
    for a, b in zip(out, ref):
        assert [l for l, _ in a] == [l for l, _ in b]
