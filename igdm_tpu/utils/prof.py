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


def summarize_trace(logdir: str, top: int = 25) -> list[tuple[str, float]]:
    """Aggregate device-op durations from a jax.profiler trace directory.

    Parses the ``*.trace.json.gz`` Chrome-trace files that
    :func:`profile_trace` writes and returns ``[(op_name, total_ms), ...]``
    sorted by total duration — the tool behind the per-op roofline table in
    BASELINE.md (no TensorBoard needed). Host-side bookkeeping events
    (profiler frames, array fetches) are filtered out.
    """
    import collections
    import glob
    import gzip
    import json

    ev: collections.Counter = collections.Counter()
    for f in glob.glob(logdir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                name = e["name"]
                if (
                    name.startswith("$")
                    or "asarray" in name
                    or "trace" in name
                    or name.startswith("PjitFunction")
                ):
                    continue
                ev[name] += e["dur"]
    return [(name, dur / 1e3) for name, dur in ev.most_common(top)]
