"""Distilled-student serving throughput (timing rules per docs/design.md:
repeat trajectories INSIDE one program, fetch only a scalar)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.config import DiffusionConfig, config_from_dict
from igdm_tpu.sampling.ancestral import make_distilled_sampler
import json

path = sys.argv[1] if len(sys.argv) > 1 else "artifacts/distilled8_model.npz"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
R = int(sys.argv[3]) if len(sys.argv) > 3 else 20

params, state, meta = load_for_sampling(path, prefer_ema=False)
params = jax.tree_util.tree_map(jnp.asarray, params)
cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
grid = meta["distill"]["grid"]
N = len(grid) - 1

for dtype_name, cdt in (("bf16", jnp.bfloat16), ("f32", None)):
    fn = make_distilled_sampler(
        params, grid, cfg=cfg, num_images=batch, model_kind=meta.get("model", "unet4"),
        compute_dtype=cdt,
    )

    @jax.jit
    def multi(key):
        def body(acc, i):
            out = fn(jax.random.fold_in(key, i))
            return acc + jnp.mean(out), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
        return acc

    key = jax.random.PRNGKey(0)
    float(multi(key))  # compile
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        float(multi(jax.random.fold_in(key, 100 + i)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    per_traj = best / R
    print(json.dumps({
        "ckpt": path, "dtype": dtype_name, "N_steps": N, "batch": batch,
        "trajs_per_call": R, "s_per_traj": round(per_traj, 5),
        "samples_per_sec": round(batch / per_traj, 1),
        "ms_per_model_call": round(per_traj / N * 1e3, 3),
    }))
