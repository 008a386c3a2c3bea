"""End-to-end throughput benchmark — the north-star metric (BASELINE.md).

Measures predictions/sec/chip through the REAL public serving path —
``AdaptiveClassifier.predict_batch``: host tokenization → encoder forward →
kNN → head → fusion, on a bert-base-size encoder.  This is apples-to-apples
with the reference's headline ONNX number (bert-base-uncased, 2.1 ms/query on
CPU *including* tokenization = ~476 predictions/sec, reference
README.md:256-261).  Queries are unique (no cache hits): every prediction
pays tokenize + embed + fuse.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_QPS = 1000.0 / 2.1  # reference ONNX CPU path: 2.1 ms/query incl. tokenization

#: AC_BENCH_SMOKE=1 shrinks every scenario (tiny encoder, small C, few
#: requests) so the full bench structure can be exercised on CPU in tests;
#: the recorded numbers are only meaningful in the default full mode on TPU
SMOKE = bool(os.environ.get("AC_BENCH_SMOKE"))


def main():
    import jax

    # persistent compile cache: tunnel-TPU compiles are slow; cache makes
    # repeat benchmark runs start in seconds
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # AC_FORCE_CPU=1: keep the bench off the TPU (the axon plugin overrides
    # JAX_PLATFORMS, so this must be an in-process config update) — used by
    # the smoke test while a long TPU job owns the single tunneled chip
    if os.environ.get("AC_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from adaptive_classifier_tpu import AdaptiveClassifier

    # flagship: bert-base dims (the reference's benchmark model), Banking77-
    # scale class count.  quantization="auto" engages the fused int8 FFN
    # Pallas path on TPU — the analog of the reference's headline being its
    # ONNX-accelerated path (README.md:256-261 is the ONNX number).
    model = "checkpoints/ac-tiny" if SMOKE else "bert-base-uncased"
    clf = AdaptiveClassifier(model, config={
        "quantization": "auto",
        "train_size_buckets": [256],
        "class_capacity_buckets": [128],
        "example_capacity_buckets": [32],
    })
    labels = [f"intent_{i}" for i in range(77)]
    clf.add_examples(
        [f"please route my {l} request to the correct team" for l in labels] * 2,
        labels * 2,
    )

    # realistic short queries, all unique → all cache misses, full pipeline
    stems = [
        "what is the exchange rate applied when i pay abroad with this card",
        "my transfer has not arrived yet please help me find where it went",
        "i want to increase the spending limit on my account starting today",
        "the app declined my payment at the store this morning for no reason",
    ]
    n_queries = 64 if SMOKE else 4096
    queries = [stems[i % len(stems)] + f" case {i}" for i in range(n_queries)]

    # warmup compiles every bucket shape on a disjoint query set
    clf.predict_batch([s + f" warm {i}" for i, s in enumerate(stems * 128)], k=5)

    # two timed passes over disjoint unique-query sets, best-of: the
    # tunneled-TPU link shows ±15-20% cross-run variance from transient
    # host/tunnel stalls; best-of-2 measures the pipeline, not the stall
    qps = 0.0
    for p in range(2):
        batch = [q + f" pass {p}" for q in queries]
        if getattr(clf, "_dev_cache", None) is not None:
            clf._dev_cache.clear()
        t0 = time.perf_counter()
        results = clf.predict_batch(batch, k=5)
        dt = time.perf_counter() - t0
        assert len(results) == n_queries and all(r for r in results)
        qps = max(qps, n_queries / dt)

    # ------------------------------------------------------------------
    # scenario 2 — serving under load (VERDICT r2 #9): sustained q/s and
    # p50/p99 through BatchingClassifierServer with mixed priorities and
    # deadlines, 4 client threads against the same 77-class classifier
    # ------------------------------------------------------------------
    serving = _bench_serving(clf, stems)

    # ------------------------------------------------------------------
    # scenario 3 — FAISS-scale index (VERDICT r2 #6): C = 16,384 prototype
    # classes through the SAME public path, so the fused two-stage top-k
    # kernel (ops/knn_topk.py — never materializes [B, C]) carries the kNN
    # stage of real predictions (the IndexFlatL2-replacement regime,
    # reference memory.py:34,114)
    # ------------------------------------------------------------------
    large = _bench_large_index(stems)

    print(json.dumps({
        "metric": "end_to_end_predictions_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "predictions/sec incl. host tokenization "
                "(predict_batch, bert-base dims, 77 classes, unique queries)",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "serving_77c": serving,
        "large_index_16384c": large,
    }))


def _bench_serving(clf, stems):
    """Serving CAPACITY and the open-loop SLO knee (VERDICT r4 #3).

    Round 4's "open loop at 80% of capacity" row recorded p50 = p99 ≈ 5.4 s
    — a standing queue: saturated capacity is measured with thousands of
    requests in flight (mean batch ~250), and that capacity does not exist
    at open-loop arrivals where batches are whatever accumulated during
    ``max_wait_ms``.  Round 5 measures what a deployment actually needs:

    1. saturated — async ``submit_predict`` keeps thousands in flight;
       the server batches freely.  This is peak capacity.
    2. open-loop knee — offered rate swept upward in fractions of the
       saturated rate, short windows, p50/p99 per point; a point is
       STABLE when its p99 stays under the 100 ms SLO and the queue
       drains within the window.  ``open_loop`` records the highest
       stable point — the rate a deployment can actually advertise.
    3. overload backpressure — a depth-bounded server offered 1.3× the
       stable rate: admission control must shed (ServerOverloaded)
       instead of letting a standing queue form, and the p99 of SERVED
       requests must stay bounded.  This is the round-4 failure mode,
       exercised on purpose.
    4. concurrency-4 closed loop — kept for comparison with round 3.
    """
    import threading

    from adaptive_classifier_tpu.serving import BatchingClassifierServer

    SLO_MS = 100.0

    def open_loop_window(srv, rate, n, tag):
        """Offer ``n`` requests at ``rate`` q/s; → (latencies s, drain s)."""
        done_at = [0.0] * n
        sent_at = [0.0] * n
        futs = []

        def _stamp(i):
            def cb(_f):
                done_at[i] = time.perf_counter()
            return cb

        t_start = time.perf_counter()
        for i in range(n):
            target = t_start + i / rate
            now = time.perf_counter()
            if target > now:
                time.sleep(target - now)
            sent_at[i] = max(target, time.perf_counter())
            f = srv.submit_predict(stems[i % len(stems)] + f" {tag} {i}", k=1)
            f.add_done_callback(_stamp(i))
            futs.append(f)
        last_send = time.perf_counter()
        for f in futs:
            try:
                f.result()
            except Exception:
                pass
        drain = time.perf_counter() - last_send
        ok = np.asarray([d - s for d, s, f in zip(done_at, sent_at, futs)
                         if f.exception() is None])
        return ok, drain, sum(1 for f in futs if f.exception() is not None)

    out: dict = {}
    with BatchingClassifierServer(clf, max_batch_size=256,
                                  max_queue_depth=65536) as srv:
        srv.predict("warm the batching path please", k=1)

        # --- 1. saturated throughput (async, all in flight) -------------
        n_sat = 64 if SMOKE else 16384
        futs = []
        t0 = time.perf_counter()
        for i in range(n_sat):
            futs.append(srv.submit_predict(
                stems[i % len(stems)] + f" sat {i}", k=1))
        for f in futs:
            f.result()
        wall = time.perf_counter() - t0
        stats = srv.stats()
        sat_qps = n_sat / wall
        out["saturated"] = {
            "qps": round(sat_qps, 1),
            "n_requests": n_sat,
            "mean_batch_size": round(stats["mean_batch_size"], 1),
        }

        # --- 2. open-loop knee sweep ------------------------------------
        knee = []
        stable = None
        for frac in (0.1, 0.2, 0.3, 0.45, 0.6, 0.8):
            rate = sat_qps * frac
            # ~3 s window (bounded for the sweep; SMOKE keeps it tiny)
            n = 24 if SMOKE else max(256, min(int(rate * 3), 8192))
            lat, drain, errs = open_loop_window(srv, rate, n, f"knee{frac}")
            row = {
                "offered_qps": round(rate, 1),
                "offered_frac_of_saturated": frac,
                "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
                "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
                "drain_s": round(drain, 3),
                "n_requests": n,
            }
            knee.append(row)
            # stable: SLO met and no standing queue left at window end
            if row["p99_ms"] <= SLO_MS and drain <= 1.0 and not errs:
                stable = row
            elif stable is not None:
                break   # past the knee; no need to melt further points
        out["open_loop_knee"] = knee
        if stable is not None:
            # re-measure the chosen point with a longer window for the
            # recorded SLO row
            rate = stable["offered_qps"]
            n = 32 if SMOKE else max(512, min(int(rate * 6), 16384))
            lat, drain, errs = open_loop_window(srv, rate, n, "slo")
            out["open_loop"] = {
                "sustainable_qps": round(rate, 1),
                "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
                "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
                "slo_ms": SLO_MS,
                "slo_met": bool(np.percentile(lat, 99) * 1e3 <= SLO_MS),
                "n_requests": n,
            }
        else:
            out["open_loop"] = {"sustainable_qps": 0.0,
                                "note": "no stable point found below "
                                        "saturated capacity"}

        # --- 4. concurrency-4 closed loop (round-3 comparison row) ------
        n_threads, per_thread = (2, 10) if SMOKE else (4, 400)
        lat4: list = []
        lock = threading.Lock()

        def client(tid):
            local = []
            for i in range(per_thread):
                prio = 1 if (i % 7 == 0) else 0
                ddl = 2000.0 if (i % 11 == 0) else None
                t0 = time.perf_counter()
                try:
                    srv.predict(stems[i % len(stems)] + f" srv {tid} {i}",
                                k=1, priority=prio, deadline_ms=ddl)
                    local.append(time.perf_counter() - t0)
                except Exception:
                    local.append(float("nan"))
            with lock:
                lat4.extend(local)

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(n_threads)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall4 = time.perf_counter() - t0
        ok = np.asarray([x for x in lat4 if x == x])
        out["concurrency_4"] = {
            "qps": round(len(ok) / wall4, 1),
            "p50_ms": round(float(np.percentile(ok, 50)) * 1e3, 2),
            "p99_ms": round(float(np.percentile(ok, 99)) * 1e3, 2),
            "n_requests": n_threads * per_thread,
        }
        out["expired"] = int(srv.requests_expired)

    # --- 3. overload backpressure: depth-bounded server past the knee ----
    # Queue depth sized from the SLO: at the stable rate the server clears
    # ~rate·SLO requests per SLO window, so a deeper queue than that is
    # already a latency violation waiting to be served — shed it instead
    # (the round-4 standing-queue failure, handled at admission).
    stable_qps = out["open_loop"].get("sustainable_qps", 0.0)
    if stable_qps:
        depth = max(64, int(stable_qps * SLO_MS / 1e3))
        with BatchingClassifierServer(clf, max_batch_size=256,
                                      max_queue_depth=depth) as bsrv:
            bsrv.predict("warm the bounded server", k=1)
            rate = stable_qps * 1.3
            n = 32 if SMOKE else max(512, min(int(rate * 4), 16384))
            lat, drain, errs = open_loop_window(bsrv, rate, n, "over")
            st = bsrv.stats()
            out["overload_backpressure"] = {
                "offered_qps": round(rate, 1),
                "max_queue_depth": depth,
                "shed": int(st["requests_shed"]),
                "shed_frac": round(st["requests_shed"] / n, 4),
                "served_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2)
                if len(lat) else None,
                "served_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2)
                if len(lat) else None,
                "n_requests": n,
            }
    return out


def _bench_large_index(stems):
    """16,384-class classifier through the public path (fused top-k regime)."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    C = 64 if SMOKE else 16384
    model = "checkpoints/ac-tiny" if SMOKE else "bert-base-uncased"
    clf = AdaptiveClassifier(model, config={
        "quantization": "auto",
        "train_size_buckets": [C],
        "class_capacity_buckets": [C],
        "example_capacity_buckets": [4],
        "example_capacity_slack": 4,
        "max_examples_per_class": 4,
    })
    topics = ["billing", "shipping", "returns", "privacy", "hardware",
              "software", "travel", "finance"]
    t0 = time.perf_counter()
    clf.add_examples(
        [f"route this {topics[i % len(topics)]} case number {i} to the "
         f"owning specialist team" for i in range(C)],
        [f"class_{i:05d}" for i in range(C)],
    )
    build_s = time.perf_counter() - t0

    # confirm the fused two-stage top-k actually carries the kNN stage:
    # the kernel's trace-time dispatch counter must tick while the
    # predict_batch program compiles (config eligibility alone proves
    # nothing about the compiled program)
    from adaptive_classifier_tpu.ops import knn_topk

    dispatches_before = knn_topk.FUSED_DISPATCHES
    n_q = 32 if SMOKE else 2048
    queries = [stems[i % len(stems)] + f" big {i}" for i in range(n_q)]
    clf.predict_batch([s + f" bigwarm {i}" for i, s in enumerate(stems * 64)],
                      k=5)
    fused_active = knn_topk.FUSED_DISPATCHES > dispatches_before
    qps = 0.0
    for p in range(2):
        batch = [q + f" pass {p}" for q in queries]
        if getattr(clf, "_dev_cache", None) is not None:
            clf._dev_cache.clear()
        t0 = time.perf_counter()
        results = clf.predict_batch(batch, k=5)
        dt = time.perf_counter() - t0
        assert len(results) == n_q and all(r for r in results)
        qps = max(qps, n_q / dt)
    return {
        "num_classes": C,
        "end_to_end_qps": round(qps, 1),
        "fused_topk_active": bool(fused_active),
        "index_build_s": round(build_s, 1),
    }


if __name__ == "__main__":
    main()
