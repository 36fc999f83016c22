"""Pallas vs XLA 3x3-conv weight-gradient at the train step's hot shapes
(round-3 attribution, BASELINE.md): B=128 unet_small wgrads. Run on chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from igdm_tpu.ops.pallas.conv_wgrad import conv3x3_wgrad

print(jax.devices(), flush=True)


@partial(jax.jit, static_argnames=())
def wgrad_xla_bf16(x, dy):
    # the contraction the train step's backward pass runs (bf16 operands,
    # f32 accumulate), expressed exactly as XLA's own wgrad reformulation
    out = lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0), dy.transpose(1, 2, 0, 3),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out.transpose(1, 2, 0, 3)


SHAPES = [  # (name, B, H, W, Ci, Co, xla_us_attr, floor_us)
    ("up1.conv1", 128, 32, 32, 128, 64, 161.4, 98.0),
    ("64ch 32x32", 128, 32, 32, 64, 64, 107.0, 49.0),
    ("down2.conv1", 128, 16, 16, 64, 128, None, None),
    ("mid 16x16", 128, 16, 16, 128, 128, None, None),
]

rng = np.random.default_rng(0)
ITERS = 200
rows = []
for name, B, H, W, Ci, Co, attr, floor in SHAPES:
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((B, H, W, Co)), jnp.bfloat16)

    r_x = wgrad_xla_bf16(x, dy).block_until_ready()
    r_p = conv3x3_wgrad(x, dy).block_until_ready()
    err = float(jnp.abs(r_p - r_x.astype(jnp.float32)).max())

    res = {}
    for tag, fn in (("xla", wgrad_xla_bf16), ("pallas", conv3x3_wgrad)):
        fn(x, dy).block_until_ready()  # warm
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = fn(x, dy)
        r.block_until_ready()
        res[tag] = (time.perf_counter() - t0) / ITERS * 1e6
    rows.append((name, res["xla"], res["pallas"], err))
    print(f"{name:14s} xla {res['xla']:8.1f} us  pallas {res['pallas']:8.1f} us  "
          f"speedup {res['xla']/res['pallas']:.2f}x  maxerr {err:.2e}"
          + (f"  (attr {attr} us, floor {floor} us)" if attr else ""), flush=True)
