"""Tracing and profiling.

Replaces the reference's timing instrumentation (SURVEY.md section 5):
EXPLAIN ANALYZE parsing (reference controller/baseline/prefilter/
prefilter_role.py:128-172, controller/dynamic_partition/search.py:66-104),
the patched-executor fetch/qual/proj regexes (search.py:214-216), and the
C++ perf_event counters (reference logical_partition_benchmark/.../
main_role_partition_comparison.cpp:510-536). There is no SQL to explain;
instead:

- `StageTimer`: named wall-clock stages with counts/totals/percentiles —
  the engine reports routing / device-scan / merge breakdowns;
- `device_trace`: a context manager around jax.profiler.trace for real
  XLA/TPU traces viewable in TensorBoard/Perfetto;
- `annotate`: jax.profiler.TraceAnnotation pass-through for custom spans.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, List

import numpy as np


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    samples: List[float] = field(default_factory=list)

    def summary(self) -> Dict[str, float]:
        s = np.asarray(self.samples) if self.samples else np.zeros(1)
        return {
            "count": self.count,
            "total_s": self.total_s,
            "mean_ms": self.total_s / max(self.count, 1) * 1000,
            "p50_ms": float(np.percentile(s, 50)) * 1000,
            "p95_ms": float(np.percentile(s, 95)) * 1000,
        }


class StageTimer:
    """Accumulates wall time per named stage. Thread-unsafe by design (one
    per engine); cheap enough to stay on in production."""

    def __init__(self, max_samples: int = 4096):
        self.stages: Dict[str, StageStats] = defaultdict(StageStats)
        self.max_samples = max_samples

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            st = self.stages[name]
            st.count += 1
            st.total_s += dt
            if len(st.samples) < self.max_samples:
                st.samples.append(dt)

    def report(self) -> Dict[str, Dict[str, float]]:
        return {name: st.summary() for name, st in self.stages.items()}

    def reset(self) -> None:
        self.stages.clear()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA/TPU profiler trace into log_dir (TensorBoard layout).
    No-op fallback when the profiler is unavailable on the platform."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named span visible in device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
