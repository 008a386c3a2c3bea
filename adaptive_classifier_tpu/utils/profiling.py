"""Tracing / profiling — first-class observability.

The reference has no tracing at all (SURVEY.md §5: ad-hoc ``time.time()`` in
scripts only).  Here profiling is a framework module: named stage timers with
aggregate stats, and a context manager around ``jax.profiler`` for device
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator

logger = logging.getLogger(__name__)


class StageTimers:
    """Aggregating named timers for pipeline stages (tokenize/embed/knn/...).

    ``block_on`` is called on jax outputs so device async dispatch doesn't
    hide the real cost inside a later stage.
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                try:
                    import jax

                    jax.block_until_ready(block_on)
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def record(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    def report(self) -> str:
        lines = [f"{'stage':<24}{'calls':>8}{'total s':>12}{'mean ms':>12}"]
        for name, s in self.summary().items():
            lines.append(f"{name:<24}{s['count']:>8}{s['total_s']:>12.4f}{s['mean_ms']:>12.3f}")
        return "\n".join(lines)


#: process-wide default timers (opt-in; the classifier uses them when
#: ``profile=True`` is passed to prediction APIs)
GLOBAL_TIMERS = StageTimers()


@contextlib.contextmanager
def device_trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler device trace (open in TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"Device trace written to {log_dir}")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up on the device timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
