"""Profiling and timing helpers.

The reference's only instrumentation is wall-clock @info lines
(last_desperate_attempt/src/train_net.jl:186,195,229). Here:
``Timer``/``timed`` do block_until_ready-accurate device timing, and
``profile_trace`` wraps ``jax.profiler`` trace capture for TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Wall-clock timer that waits for device completion on exit."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def timed(fn, *args, warmup: int = 1, iters: int = 5, **kwargs):
    """Time a jitted fn accurately: warmup compiles, then block_until_ready.

    Returns (best_seconds, mean_seconds, last_result).
    """
    result = None
    for _ in range(max(warmup, 1)):
        result = jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return min(times), sum(times) / len(times), result


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
