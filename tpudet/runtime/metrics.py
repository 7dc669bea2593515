"""Observability: step timing, throughput meters, and jax.profiler trace hooks.

The reference's observability is two datetime prints (YOLOv3.py:459-462) and a loss
summary scalar; this supplies the TPU-native equivalents promised in SURVEY.md §5:
``StepTimer`` (wall-clock per step with device sync), ``Throughput`` (images/sec),
and ``trace`` (context manager around ``jax.profiler`` for XLA-level traces viewable
in TensorBoard/Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


class StepTimer:
    """Wall-clock timing with percentile summaries; call mark() after each synced step."""

    def __init__(self):
        self._times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def mark(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    def summary(self):
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "total_s": float(t.sum()),
        }


class Throughput:
    def __init__(self, items_per_step: int):
        self.items_per_step = items_per_step
        self.timer = StepTimer()

    def start(self):
        self.timer.start()

    def mark(self):
        self.timer.mark()

    def items_per_sec(self) -> Optional[float]:
        s = self.timer.summary()
        if not s:
            return None
        return self.items_per_step / s["p50_s"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a block (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_until_ready(tree):
    import jax

    jax.block_until_ready(tree)
    return tree
