"""Tracing / profiling hooks (the reference has none — SURVEY.md §5).

- ``trace(log_dir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the wrapped region.
- ``StepTimer``: lightweight wall-clock step timing with percentile summary
  — the always-on observability layer for production runs.
- ``annotate``: named trace region (shows up in the profile timeline).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step wall-clock stats; negligible overhead (no device
    syncs — pair with the trainers' lazy loss pulls)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times: List[float] = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps_per_sec": float(1.0 / np.median(arr)),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
        }
