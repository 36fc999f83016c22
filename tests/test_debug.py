"""NaN-debugging utilities (aux subsystem: SURVEY.md section 5.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from igdm_tpu.utils.debug import checked_call


def test_checked_call_passes_clean():
    out = checked_call(lambda x: x * 2.0, jnp.ones((4,)))
    np.testing.assert_array_equal(np.asarray(out), 2.0)


def test_checked_call_raises_on_nan():
    def bad(x):
        return x / jnp.zeros_like(x)  # inf, then nan via 0/0 at x=0

    with pytest.raises(Exception):
        checked_call(lambda x: jnp.log(-x), jnp.ones((4,)))


def test_assert_finite_noop_when_disabled(monkeypatch):
    monkeypatch.delenv("IGDM_DEBUG_NANS", raising=False)
    from igdm_tpu.utils.debug import assert_finite

    x = jnp.asarray([np.nan])
    out = assert_finite(x, "x")  # disabled: passes through
    assert np.isnan(np.asarray(out)).all()


def test_profile_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp

    from igdm_tpu.utils.prof import profile_trace, timed

    f = jax.jit(lambda x: x * 2 + 1)
    with profile_trace(str(tmp_path)):
        np_ = f(jnp.ones((8, 8)))
        np_.block_until_ready()
    import glob

    assert glob.glob(str(tmp_path / "plugins" / "profile" / "*" / "*"))


def test_timed_returns_sane_values():
    import jax
    import jax.numpy as jnp

    from igdm_tpu.utils.prof import timed

    best, mean, result = timed(jax.jit(lambda x: x + 1), jnp.zeros((4,)), iters=2)
    assert 0 < best <= mean
    assert result.shape == (4,)


def test_summarize_trace(tmp_path):
    """profile_trace + summarize_trace round-trip on the CPU backend."""
    import jax
    import jax.numpy as jnp

    from igdm_tpu.utils.prof import profile_trace, summarize_trace

    f = jax.jit(lambda x: jnp.sum(x * x))
    x = jnp.ones((256, 256))
    float(f(x))  # compile outside the trace
    with profile_trace(str(tmp_path)):
        float(f(x))
    ops = summarize_trace(str(tmp_path))
    assert isinstance(ops, list)
    assert all(isinstance(n, str) and d >= 0 for n, d in ops)
    assert len(ops) > 0  # at least one device/runtime op recorded


def test_classify_trace(tmp_path):
    """classify_trace joins profiler times with the compiled HLO: a matmul
    program must attribute time to the MXU bucket (or at minimum produce
    non-negative, well-formed buckets on backends with coarser traces)."""
    import jax
    import jax.numpy as jnp

    from igdm_tpu.utils.prof import classify_trace, profile_trace

    def f(x):
        return jnp.sum(jnp.dot(x, x) ** 2)

    jf = jax.jit(f)
    x = jnp.ones((512, 512))
    compiled = jf.lower(x).compile().as_text()
    float(jf(x))  # compile outside the trace
    with profile_trace(str(tmp_path)):
        float(jf(x))
    buckets = classify_trace(str(tmp_path), compiled)
    assert isinstance(buckets, dict)
    for name, (ms, cnt) in buckets.items():
        assert ms >= 0 and cnt >= 1, name


def test_device_module_ms_synthetic_trace(tmp_path):
    """device_module_ms must sum ONLY the XLA-module spans of device lanes —
    not host events and not the nested per-op lane (which double-counts
    fusions inside their while/module containers)."""
    import gzip
    import json
    import os

    from igdm_tpu.utils.prof import device_module_ms

    events = [
        {"ph": "M", "pid": 3, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name", "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 4, "name": "thread_name", "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name", "args": {"name": "python"}},
        # counted: two module executions on the device
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_f(123)", "dur": 1500, "ts": 0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_g(456)", "dur": 500, "ts": 2000},
        # NOT counted: nested op lane (sums to more than the module span)
        {"ph": "X", "pid": 3, "tid": 4, "name": "while.6", "dur": 1400, "ts": 0},
        {"ph": "X", "pid": 3, "tid": 4, "name": "fusion.1", "dur": 1300, "ts": 50},
        # NOT counted: host work
        {"ph": "X", "pid": 7, "tid": 1, "name": "dispatch", "dur": 9999, "ts": 0},
    ]
    d = tmp_path / "plugins" / "profile" / "run"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    assert device_module_ms(str(tmp_path)) == (1500 + 500) / 1e3
