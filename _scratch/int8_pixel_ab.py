"""A/B: int8 3x3 convs in the pixel T=500 baked sampler vs bf16.

Calibration: one full bf16 trajectory with per-conv abs-max carried
through the scan (activation stats vary across t, so scales must cover
the whole trajectory). Then throughput + output-agreement at batch 256.
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
from igdm_tpu.config import DiffusionConfig, config_from_dict
from igdm_tpu.diffusion.processes import reverse_diffusion_step
from igdm_tpu.models import unet_small
from igdm_tpu.models.embeddings import timestep_embedding
from igdm_tpu.sampling.ancestral import _alpha_bar

params, state, meta = load_for_sampling(os.path.join(ROOT, "artifacts", "flagship_model.npz"),
                                        prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)
state = jax.tree_util.tree_map(jnp.asarray, state)
cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
folded = unet_small.fold_bn(params, state)
alpha_bar = _alpha_bar(cfg)
T, D = cfg.num_steps, cfg.embed_dim
CONVS = ["down1.conv2", "down2.conv1", "down2.conv2", "mid.conv1", "mid.conv2",
         "up2.conv1", "up2.conv2", "up1.conv1", "up1.conv2"]


def make_fn(B, compute_dtype, act_scales=None, with_calib=False):
    @jax.jit
    def fn(key):
        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, (B, 32, 32, 1), jnp.float32)
        t_vals = jnp.arange(T, 1, -1)
        amax0 = {c: jnp.float32(0.0) for c in CONVS}

        def body(carry, inputs):
            x, amax = carry
            t, i = inputs
            t_emb = timestep_embedding(jnp.full((1,), t, jnp.float32), D)
            taps = {}

            def tap(name, h):
                taps[name] = jnp.max(jnp.abs(h.astype(jnp.float32)))

            eps = unet_small.apply_folded(
                folded, x, t_emb, compute_dtype=compute_dtype,
                decompose_time_conv=True, act_scales=act_scales,
                _tap=tap if with_calib else None,
            )
            if with_calib:
                amax = {c: jnp.maximum(amax[c], taps[c]) for c in CONVS}
            noise = jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
            x = reverse_diffusion_step(x, eps, noise, alpha_bar[t - 1],
                                       alpha_bar[t - 2], use_noise=True)
            return (x, amax), None

        (x, amax), _ = jax.lax.scan(body, (x, amax0), (t_vals, jnp.arange(t_vals.shape[0])))
        return jnp.clip(x, -1.0, 1.0), amax

    return fn


def _sync(x):
    return np.asarray(x).ravel()[0]


key = jax.random.PRNGKey(42)
# 1) calibrate on a bf16 trajectory (batch 64 is plenty for abs-max)
_, amax = make_fn(64, jnp.bfloat16, with_calib=True)(key)
scales = {c: float(v) / 127.0 for c, v in amax.items()}
print("calibrated scales:", {k: round(v, 5) for k, v in scales.items()})

# 2) throughput A/B at batch 256
f_bf16 = make_fn(256, jnp.bfloat16)
f_int8 = make_fn(256, "int8", act_scales=scales)


def rate(fn, iters=4):
    _sync(fn(key)[0])
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        _sync(fn(jax.random.fold_in(key, i))[0])
        ts.append(time.perf_counter() - t0)
    return 256 / min(ts), min(ts)


for name, fn in [("bf16", f_bf16), ("int8", f_int8), ("bf16#2", f_bf16), ("int8#2", f_int8)]:
    sps, wall = rate(fn)
    print(f"pixel T=500 sampler, {name}: {sps:8.1f} samples/s  ({wall:.3f}s/traj)")

# 3) output agreement from the same key
xa = np.asarray(f_bf16(key)[0])
xb = np.asarray(f_int8(key)[0])
err = xb - xa
print(f"int8 vs bf16 samples: rmse {np.sqrt((err**2).mean()):.5f} "
      f"max {np.abs(err).max():.5f} (range [-1,1])")

# 4) corrected-frame 512x3 quality A/B (evaluate_sampler protocol)
from igdm_tpu.data.mat import load_synthetic_images
from igdm_tpu.utils.quality import evaluate_sampler

d32 = np.clip(load_synthetic_images()[..., 0], 0.0, 1.0)


def qfn(fn):
    def sample(key, n):
        x, _ = fn(key)
        return (np.asarray(x)[:n, ..., 0] + 1.0) / 2.0
    return sample


for name, fn in [("bf16", f_bf16), ("int8", f_int8)]:
    rep = evaluate_sampler(qfn(fn), d32, n_samples=512, seeds=(0, 1, 2), batch=256)
    print(f"quality {name}: nn_mse {rep['nn_mse']['mean']:.5f}±{rep['nn_mse']['std']:.5f} "
          f"cov {rep['coverage']['mean']:.3f}±{rep['coverage']['std']:.3f} "
          f"div {rep['pairwise_diversity']['mean']:.4f}")
