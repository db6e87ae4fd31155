"""Tracing / profiling hooks (the reference has none — SURVEY §5).

- `step_timer`: lightweight wall-clock timer with running statistics,
  synchronizing on a jax array to measure true device time.
- `trace`: context manager around jax.profiler for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StepTimer:
    """Accumulates per-step wall times; `summary()` gives mean/p50/p95."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.times.append(time.perf_counter() - self._t0)

    @contextlib.contextmanager
    def measure(self, sync_on=None):
        self.start()
        yield
        self.stop(sync_on)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p95_s": ts[min(n - 1, int(n * 0.95))],
            "steps": n,
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
