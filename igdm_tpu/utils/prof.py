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


def device_module_ms(logdir: str) -> float:
    """Total on-device execution time (ms) in a jax.profiler trace: the sum
    of XLA-module spans on the device lanes ("XLA Modules" threads of
    ``/device:*`` processes). This is the chip-state-independent number the
    bench JSON carries as ``*_device_step_ms`` — wall minus this is
    dispatch/fetch overhead (the dev relay's ~27 ms null call). Summing
    per-op events instead would double-count: the op lane nests fusions
    inside their ``while``/module container spans (measured 3x the module
    span on the sampling trace).
    """
    import glob
    import gzip
    import json

    total = 0.0
    for f in glob.glob(logdir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            ev = json.load(fh).get("traceEvents", [])
        dev_pids = {
            e["pid"]
            for e in ev
            if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and "device" in (e.get("args", {}).get("name") or "").lower()
        }
        mod_lanes = {
            (e["pid"], e["tid"])
            for e in ev
            if e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") in dev_pids
            and "module" in (e.get("args", {}).get("name") or "").lower()
        }
        for e in ev:
            if e.get("ph") == "X" and "dur" in e and (e.get("pid"), e.get("tid")) in mod_lanes:
                total += e["dur"]
    return total / 1e3


def classify_trace(
    logdir: str, compiled_text: str, *, top: int = 400
) -> dict[str, tuple[float, int]]:
    """Bucket a profiled program's device time by what each fusion contains.

    XLA's profiler names fusions opaquely (``fusion.602``,
    ``multiply_add_fusion.314``); the compiled HLO (``jit_fn.lower(*args)
    .compile().as_text()``) says what is inside each. Joining the two
    attributes every microsecond to a hardware resource:

    * ``"MXU (conv/dot fusion)"`` — fusions containing a convolution or dot
    * ``"reduce fusion"`` — reductions (norm statistics, loss, wgrad sums)
    * ``"copy/broadcast/convert"`` — pure data movement
    * ``"elementwise fusion"`` — everything else (activation chains, masks)

    Returns ``{bucket: (total_ms, op_count)}``. This is the tool behind the
    training-step attribution in BASELINE.md (conv 65% / reduce 18% / ...),
    which redirected round-2 optimization from the wrongly-suspected
    BatchNorm statistics to the real elementwise+reduce tail.
    """
    import re

    comp_ops: dict[str, set] = {}
    cur = None
    for line in compiled_text.splitlines():
        mm = re.match(r"\s*(%[\w.\-]+|ENTRY [\w.\-]+|[\w.\-]+)\s.*{\s*$", line)
        if mm and ("{" in line) and ("=" not in line):
            cur = mm.group(1).lstrip("%").replace("ENTRY ", "")
            comp_ops[cur] = set()
            continue
        if cur is None:
            continue
        for kind in ("convolution", "dot", "reduce", "scatter", "gather", "rng", "sort"):
            if f"{kind}(" in line or line.strip().startswith(kind):
                comp_ops[cur].add(kind)

    fusion_target = {
        m.group(1): m.group(2)
        for m in re.finditer(
            r"%?([\w.\-]+) = [^\n]*fusion\([^\n]*calls=%?([\w.\-]+)", compiled_text
        )
    }

    buckets: dict[str, list] = {}
    for name, ms in summarize_trace(logdir, top=top):
        base = name.split("(")[0]
        if base in ("0",) or base.startswith("jit_") or base.startswith("while"):
            continue
        kinds = comp_ops.get(fusion_target.get(base, ""), set())
        if "convolution" in kinds or "dot" in kinds or base.startswith(("convolution", "dot")):
            b = "MXU (conv/dot fusion)"
        elif "reduce" in kinds or base.startswith(("reduce", "multiply_reduce", "convert_reduce")):
            b = "reduce fusion"
        elif "rng" in kinds or "sort" in kinds:
            b = "rng/sort"
        elif base.startswith(("copy", "broadcast", "convert", "bitcast", "tuple", "get-tuple")):
            b = "copy/broadcast/convert"
        else:
            b = "elementwise fusion"
        buckets.setdefault(b, [0.0, 0])
        buckets[b][0] += ms
        buckets[b][1] += 1
    return {k: (v[0], v[1]) for k, v in buckets.items()}
