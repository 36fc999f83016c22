"""Probe: does int8 conv (int32 accumulation) beat bf16 conv on the chip
at the framework's hot serving shapes?  v5e's MXU runs int8 at ~2x the
bf16 rate *if* Mosaic emits an int8 conv; if XLA falls back to upcasting
the probe shows it immediately.  Shapes: the pixel sampler's hot conv
(batch 256, 32x32, 64->64) and the VAE decoder's hot conv
(batch 1024, 32x32, 64->32) from the round-5 latent roofline.
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import numpy as np


def _sync(x):
    return np.asarray(x).ravel()[0]


def time_conv(N, H, W, Cin, Cout, dtype, R=200):
    k = jax.random.PRNGKey(0)
    if dtype == "int8":
        x = jax.random.randint(k, (N, H, W, Cin), -127, 127, jnp.int8)
        w = jax.random.randint(k, (3, 3, Cin, Cout), -127, 127, jnp.int8)
        acc = jnp.int32
    else:
        x = jax.random.normal(k, (N, H, W, Cin), dtype)
        w = jax.random.normal(k, (3, 3, Cin, Cout), dtype)
        acc = jnp.float32

    @jax.jit
    def run(x, w):
        def body(c, i):
            # input depends on the scanned index so XLA cannot hoist the
            # conv out of the loop (LICM broke the first probe version)
            xi = x + i.astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                xi, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            return c + y.astype(jnp.float32).mean(), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
        return c

    _sync(run(x, w))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(x, w))
        ts.append(time.perf_counter() - t0)
    per_call = min(ts) / R
    flops = 2 * N * H * W * 9 * Cin * Cout
    return per_call * 1e6, flops / per_call / 1e12


for name, shape in [
    ("pixel-hot 256x32x32 64->64", (256, 32, 32, 64, 64)),
    ("decoder-hot 1024x32x32 64->32", (1024, 32, 32, 64, 32)),
]:
    for dt in ("bfloat16", "int8"):
        us, tf = time_conv(*shape, dt)
        print(f"{name:34s} {dt:9s} {us:9.1f} us/call  {tf:7.1f} TF/s(-equiv)")
