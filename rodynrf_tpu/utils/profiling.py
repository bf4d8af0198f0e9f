"""Tracing / profiling hooks.

The reference has no profiling support (SURVEY.md §5.1 — tqdm only). Here:
  * `trace(logdir)` — context manager around `jax.profiler` traces
    (view in TensorBoard / xprof; captures XLA ops, HBM, fusion),
  * `StepTimer` — cheap wall-clock stats for the hot loop,
  * `annotate(name)` — named trace regions inside host code.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the profiler timeline (host-side)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock stats (mean/p50/p95) for train/render steps."""

    def __init__(self, window: int = 200):
        self.window = window
        self.samples = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)
        if len(self.samples) > self.window:
            self.samples.pop(0)

    def stats(self) -> dict:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "mean_ms": 1000 * sum(s) / n,
            "p50_ms": 1000 * s[n // 2],
            "p95_ms": 1000 * s[min(n - 1, int(n * 0.95))],
            "steps_per_sec": n / sum(s),
        }
