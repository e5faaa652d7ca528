"""Tracing / profiling hooks (SURVEY.md §5.1: the reference has none beyond
print logging — this is the TPU-native upgrade).

* trace_context — jax.profiler trace wrapper; open the dump in
  Perfetto/XProf.
* StepTimer — host-side per-step wall/device timing with percentile summary
  (p50/p90/p99), the train loop's observability primitive.
* annotate — named TraceAnnotation for nested regions inside a step.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """Profile the enclosed region with jax.profiler (no-op if log_dir None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing with streaming percentiles."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)
        return False

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "p99_s": float(np.percentile(t, 99)),
            "total_s": float(t.sum()),
        }
