"""Tracing / profiling utilities (new capability — the reference has none, SURVEY.md §5).

- `trace(logdir)`: context manager around jax.profiler for TensorBoard-viewable
  device traces of train/sample steps.
- `StepTimer`: rolling per-step wall-time stats (p50/p90/mean) with correct device
  synchronization.
- `annotate`: named trace spans (shows up in the profiler timeline).
"""
from __future__ import annotations

import contextlib
import time
from collections import deque

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def block_on(tree):
    """Synchronize on a pytree of device arrays (for honest timing)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, 'block_until_ready'):
            leaf.block_until_ready()
    return tree


class StepTimer:
    """Rolling step-time statistics."""

    def __init__(self, window: int = 100):
        self.times = deque(maxlen=window)
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_tree=None):
        if sync_tree is not None:
            block_on(sync_tree)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def measure(self):
        self.start()
        yield
        self.stop()

    def summary(self):
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return dict(
            mean_s=float(arr.mean()),
            p50_s=float(np.percentile(arr, 50)),
            p90_s=float(np.percentile(arr, 90)),
            steps_per_sec=float(1.0 / arr.mean()),
            n=len(arr),
        )
