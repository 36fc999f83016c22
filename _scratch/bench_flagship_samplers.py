"""Same-model sampler throughput table (unet4-64 flagship, batch 256):
textbook-500 / DPM++-10 / distilled-8 under identical in-program-repeat
timing."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.config import DiffusionConfig, config_from_dict

batch = 256

def timeit(fn, R):
    @jax.jit
    def multi(key):
        def body(acc, i):
            return acc + jnp.mean(fn(jax.random.fold_in(key, i))), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
        return acc
    key = jax.random.PRNGKey(0)
    float(multi(key))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(multi(jax.random.fold_in(key, 50 + i)))
        times.append(time.perf_counter() - t0)
    return min(times) / R

params, state, meta = load_for_sampling("artifacts/quality3_model_sampling.npz", prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)
cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))

from igdm_tpu.sampling.ancestral import make_textbook_sampler, sample_dpmpp2m, make_distilled_sampler

rows = []
fn500 = make_textbook_sampler(params, {}, cfg=cfg, num_images=batch, model_kind="unet4")
t = timeit(fn500, 2)
rows.append({"sampler": "textbook-500", "s_per_traj": round(t, 4), "samples_per_sec": round(batch / t, 1)})
print(rows[-1], flush=True)

fn10 = lambda key: sample_dpmpp2m(params, {}, key, num_images=batch, cfg=cfg, num_sample_steps=10, model_kind="unet4")
t = timeit(fn10, 16)
rows.append({"sampler": "dpmpp-10", "s_per_traj": round(t, 4), "samples_per_sec": round(batch / t, 1)})
print(rows[-1], flush=True)

sp, sstate, smeta = load_for_sampling("artifacts/distilled8_model.npz", prefer_ema=False)
sp = jax.tree_util.tree_map(jnp.asarray, sp)
fn8 = make_distilled_sampler(sp, smeta["distill"]["grid"], cfg=cfg, num_images=batch, model_kind="unet4")
t = timeit(fn8, 20)
rows.append({"sampler": "distilled-8", "s_per_traj": round(t, 4), "samples_per_sec": round(batch / t, 1)})
print(rows[-1], flush=True)
print(json.dumps(rows))
