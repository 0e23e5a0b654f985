"""Profiling hooks.

The reference's tracing was wall-clock meters only (SURVEY.md section 5.1).
Here: jax.profiler trace capture around training steps plus a lightweight
step timer that forces completion (block_until_ready is unreliable on remote
platforms — use a value transfer)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (view with tensorboard/xprof) when a
    directory is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_sync(x) -> float:
    """Force device completion by transferring one scalar; returns it."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


class StepTimer:
    """Median step time with honest end-of-window sync."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            force_sync(result)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def median_ms(self) -> float:
        import numpy as np

        return 1000.0 * float(np.median(self.times)) if self.times else 0.0
