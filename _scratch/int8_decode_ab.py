"""A/B: int8 VAE decode vs bf16/f32 on the real committed checkpoints.

1. Fidelity: decode the same real latents (reflow-1 student outputs) with
   f32 / bf16 / int8 and report rmse + max-abs-err vs f32.
2. Throughput: the bench_latent_reflow harness with bf16 vs int8 decode,
   batch 1024, single process so relay tenancy cancels.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.models import autoencoder
from igdm_tpu.sampling.auto import _lmeta_scale
from igdm_tpu.sampling.flow import make_flow_sampler
from igdm_tpu.training.latent import load_autoencoder, resolve_ae_path

path = os.path.join(ROOT, "artifacts", "latent_reflow_model.npz")
params, _, meta = load_for_sampling(path, prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)
ae_params, _ = load_autoencoder(resolve_ae_path(path, meta["latent"]))
dm = meta.get("data", {})
scale = _lmeta_scale(meta["latent"])

B = 1024
zfn = make_flow_sampler(
    params, num_images=B, steps=1, method="euler",
    time_scale=float(meta["flow"].get("time_scale", 1000.0)),
    image_size=tuple(dm.get("image_size", (8, 8))),
    channels=int(dm.get("channels", 4)), compute_dtype=jnp.bfloat16,
)

# ---- fidelity on real latents ----
z = zfn(jax.random.PRNGKey(7)) / scale
dec_f32 = np.asarray(jax.jit(lambda z: autoencoder.decode(ae_params, z))(z))
dec_bf16 = np.asarray(
    jax.jit(lambda z: autoencoder.decode(ae_params, z, compute_dtype=jnp.bfloat16))(z)
)
dec_i8 = np.asarray(
    jax.jit(lambda z: autoencoder.decode(ae_params, z, compute_dtype="int8"))(z)
)
for name, d in [("bf16", dec_bf16), ("int8", dec_i8)]:
    err = d - dec_f32
    print(f"decode {name} vs f32: rmse {np.sqrt((err**2).mean()):.6f} "
          f"max {np.abs(err).max():.6f}  (image range ~[-1,1])")

# ---- throughput ----
def _sync(x):
    return np.asarray(x).ravel()[0]


def rate(decode_dtype, R=50):
    def fn(key):
        return autoencoder.decode(ae_params, zfn(key) / scale,
                                  compute_dtype=decode_dtype)

    @jax.jit
    def multi(key):
        def body(acc, i):
            return acc + jnp.mean(fn(jax.random.fold_in(key, i))), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
        return acc

    key = jax.random.PRNGKey(0)
    _sync(multi(key))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _sync(multi(jax.random.fold_in(key, 100 + i)))
        ts.append(time.perf_counter() - t0)
    return B / (min(ts) / R)


for name, dt in [("bf16", jnp.bfloat16), ("int8", "int8"), ("bf16#2", jnp.bfloat16),
                 ("int8#2", "int8")]:
    print(f"reflow-1 serving, {name} decode: {rate(dt):,.0f} samples/s")

# ---- static-scale int8 (calibrated): the abs-max pass removed ----
from igdm_tpu.models.autoencoder import calibrate_decode_int8

cal = calibrate_decode_int8(ae_params, z)
print("calibrated scales:", {k: round(v, 5) for k, v in cal.items()})
dec_i8s = np.asarray(jax.jit(
    lambda z: autoencoder.decode(ae_params, z, compute_dtype="int8", act_scales=cal)
)(z))
err = dec_i8s - dec_f32
print(f"decode int8-static vs f32: rmse {np.sqrt((err**2).mean()):.6f} "
      f"max {np.abs(err).max():.6f}")


def rate2(decode_dtype, scales, R=50):
    def fn(key):
        return autoencoder.decode(ae_params, zfn(key) / scale,
                                  compute_dtype=decode_dtype, act_scales=scales)

    @jax.jit
    def multi(key):
        def body(acc, i):
            return acc + jnp.mean(fn(jax.random.fold_in(key, i))), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
        return acc

    key = jax.random.PRNGKey(0)
    _sync(multi(key))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _sync(multi(jax.random.fold_in(key, 100 + i)))
        ts.append(time.perf_counter() - t0)
    return B / (min(ts) / R)


for name, dt, sc in [("bf16", jnp.bfloat16, None), ("int8-static", "int8", cal),
                     ("bf16#2", jnp.bfloat16, None), ("int8-static#2", "int8", cal)]:
    print(f"reflow-1 serving, {name} decode: {rate2(dt, sc):,.0f} samples/s")
