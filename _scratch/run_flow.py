"""Flow-matching flagship: train unet4-64 rectified flow with the SAME
budget as the round-2 DDPM flagship (batch 32, 1000 epochs = 16k steps,
lr 2e-4, EMA 0.9995, bf16, epochs_per_dispatch 10), then evaluate the
ODE samplers' quality ladder and serving throughput under the identical
in-program-repeat timing used for the distillation table."""
import json, time
import numpy as np
import jax, jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from igdm_tpu.config import TrainConfig
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.training.flow import train_flow
from igdm_tpu.utils.quality import evaluate_samples

imgs = normalize_pm1(load_synthetic_images())
dataset01 = (imgs + 1.0) / 2.0  # display space

train_cfg = TrainConfig(
    epochs=1000, batch_size=32, lr=2e-4, patience=100_000, min_delta=0.0,
    ema_decay=0.9995, compute_dtype="bfloat16", epochs_per_dispatch=10,
    checkpoint_every=0,
)
t0 = time.time()
res = train_flow(
    imgs, train_cfg, base_ch=64, out_dir="/root/repo/artifacts",
    save_final="flow64_model", log=None,
)
steps = res.epochs_run * (500 // train_cfg.batch_size + (1 if 500 % train_cfg.batch_size else 0))
print(f"trained {res.epochs_run} epochs ({steps} steps) in {time.time()-t0:.0f}s, "
      f"final loss {res.losses[-1]:.4f}", flush=True)

# ---- quality ladder (64 samples, EMA weights, display space) ----
from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.sampling.flow import sample_flow

params, _, meta = load_for_sampling("/root/repo/artifacts/flow64_model.npz", prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)

rows = {}
for method, step_list in (("euler", (4, 8, 16, 32, 64)), ("heun", (8, 16))):
    for n in step_list:
        out = sample_flow(
            params, jax.random.PRNGKey(0), num_images=64, steps=n, method=method,
        )
        s01 = np.clip((np.asarray(out)[..., 0] + 1.0) / 2.0, 0.0, 1.0)
        m = evaluate_samples(s01, dataset01[..., 0])
        rows[f"{method}-{n}"] = {k: round(float(v), 4) for k, v in m.items()}
        print(f"{method}-{n}:", rows[f"{method}-{n}"], flush=True)

# save a sample grid for the best few-step config
from igdm_tpu.data.images import save_sample_grid
out = sample_flow(params, jax.random.PRNGKey(0), num_images=64, steps=8, method="euler")
s01 = np.clip((np.asarray(out)[..., 0] + 1.0) / 2.0, 0.0, 1.0)
save_sample_grid(s01, "/root/repo/artifacts/samples_flow_euler8.png")

# ---- serving throughput, identical in-program-repeat harness ----
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

perf = {}
for method, n, R in (("euler", 8, 20), ("euler", 16, 16), ("heun", 8, 16)):
    fn = lambda key: sample_flow(params, key, num_images=batch, steps=n, method=method)
    t = timeit(fn, R)
    perf[f"{method}-{n}"] = {"s_per_traj": round(t, 4), "samples_per_sec": round(batch / t, 1)}
    print(f"perf {method}-{n}:", perf[f"{method}-{n}"], flush=True)

with open("/root/repo/artifacts/flow_quality.json", "w") as f:
    json.dump({"quality": rows, "perf_batch256": perf,
               "train": {"epochs": res.epochs_run, "final_loss": float(res.losses[-1])}}, f, indent=1)
print("done")
