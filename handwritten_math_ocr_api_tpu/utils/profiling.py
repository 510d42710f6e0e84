"""Tracing/profiling: jax.profiler capture + lightweight stage timers.

The reference had no tracing at all — only per-request wall-clock timing
surfaced as ``processing_time`` (app/src/main.py:452,488; SURVEY §5). Here:
- ``trace(dir)``: context manager writing a TensorBoard-loadable XLA/TPU
  trace via ``jax.profiler`` (kernel timeline, HBM usage);
- ``start_profiler_server(port)``: live profiling endpoint usable with
  TensorBoard's profile plugin;
- ``StageTimer``: named wall-clock stages with EWMA summaries, used by the
  serving layer for per-stage latency metrics.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_profiler_server(port: int = 9999) -> bool:
    """Start the live jax profiler server (idempotent best-effort)."""
    import jax

    try:
        jax.profiler.start_server(port)
        return True
    except Exception:
        return False


class StageTimer:
    """Named stage timers with count/total/EWMA, cheap enough for the
    request path. Thread-safe for CPython increments."""

    def __init__(self, ewma_alpha: float = 0.1):
        self.alpha = ewma_alpha
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.ewma: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            prev = self.ewma.get(name)
            self.ewma[name] = dt if prev is None else \
                (1 - self.alpha) * prev + self.alpha * dt

    def reset(self) -> None:
        """Drop all recorded stages (e.g. post-warmup, so steady-state
        summaries exclude compile-inflated first requests)."""
        self.totals.clear()
        self.counts.clear()
        self.ewma.clear()

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "count": self.counts[name],
                "total_sec": self.totals[name],
                "mean_sec": self.totals[name] / self.counts[name],
                "ewma_sec": self.ewma.get(
                    name, self.totals[name] / self.counts[name]),
            }
            for name in self.counts
        }
