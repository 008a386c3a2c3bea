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
    """Mixed-priority load through the batching server (single chip)."""
    import threading

    from adaptive_classifier_tpu.serving import BatchingClassifierServer

    n_threads, per_thread = (2, 20) if SMOKE else (4, 1500)
    lat: list = []
    lock = threading.Lock()
    with BatchingClassifierServer(clf, max_batch_size=256,
                                  max_queue_depth=16384) as srv:
        # warm the server path
        srv.predict("warm the batching path please", k=1)

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
                lat.extend(local)

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(n_threads)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        expired = srv.requests_expired
    ok = np.asarray([x for x in lat if x == x])
    return {
        "sustained_qps": round(len(ok) / wall, 1),
        "p50_ms": round(float(np.percentile(ok, 50)) * 1e3, 2),
        "p99_ms": round(float(np.percentile(ok, 99)) * 1e3, 2),
        "n_requests": n_threads * per_thread,
        "expired": int(expired),
        "clients": n_threads,
    }


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
