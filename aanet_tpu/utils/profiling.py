"""Runtime profiling: jax.profiler traces + step timing.

TPU-native replacement for the reference's two profiling mechanisms
(SURVEY §5): wall-clock timing with warmup (`inference.py:164-175`) and
seconds-per-window training speed logging (`model.py:157-167`). Traces
are standard `jax.profiler` captures viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into `log_dir` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 10,
    iters: int = 100,
) -> float:
    """Mean seconds per call, with warmup (the reference's timing protocol,
    `inference.py:164-175`: 10 warmup forwards, then averaged wall time)."""
    for _ in range(max(1, warmup)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


class StepTimer:
    """Rolling step timing + ETA (the reference's per-window 'time' and
    projected hours-to-finish log, `model.py:157-167`)."""

    def __init__(self, total_steps: int):
        self.total_steps = total_steps
        self.last = time.time()
        self.steps_done = 0

    def lap(self, steps: int = 1) -> dict:
        now = time.time()
        elapsed = now - self.last
        self.last = now
        self.steps_done += steps
        per_step = elapsed / max(1, steps)
        remaining = max(0, self.total_steps - self.steps_done)
        return {
            "window_seconds": elapsed,
            "seconds_per_step": per_step,
            "eta_hours": per_step * remaining / 3600.0,
        }
