"""Reflow flagship: 2-rectified-flow fine-tune of artifacts/flow64_model.npz
on its own heun-64 ODE couplings, then the few-step quality ladder + serving
perf (same in-program-repeat harness as the distillation table)."""
import json, time
import numpy as np
import jax, jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from igdm_tpu.config import TrainConfig
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.training.flow import train_reflow
from igdm_tpu.utils.quality import evaluate_samples

imgs = normalize_pm1(load_synthetic_images())
dataset01 = (imgs + 1.0) / 2.0

train_cfg = TrainConfig(
    epochs=200, batch_size=128, lr=1e-4, patience=100_000, min_delta=0.0,
    ema_decay=0.999, compute_dtype="bfloat16", epochs_per_dispatch=10,
    checkpoint_every=0,
)
t0 = time.time()
res = train_reflow(
    "/root/repo/artifacts/flow64_model.npz", train_cfg,
    num_pairs=4096, coupling_steps=64, coupling_method="heun",
    out_dir="/root/repo/artifacts", save_final="reflow64_model", log=print,
)
print(f"reflow: {res.epochs_run} epochs in {time.time()-t0:.0f}s, "
      f"final loss {res.losses[-1]:.4f}", flush=True)

from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.sampling.flow import sample_flow

params, _, meta = load_for_sampling(
    "/root/repo/artifacts/reflow64_model.npz", prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)

rows = {}
for method, step_list in (("euler", (1, 2, 4, 8, 16)), ("heun", (2, 4))):
    for n in step_list:
        out = sample_flow(
            params, jax.random.PRNGKey(0), num_images=64, steps=n, method=method,
        )
        s01 = np.clip((np.asarray(out)[..., 0] + 1.0) / 2.0, 0.0, 1.0)
        m = evaluate_samples(s01, dataset01[..., 0])
        rows[f"{method}-{n}"] = {k: round(float(v), 4) for k, v in m.items()}
        print(f"{method}-{n}:", rows[f"{method}-{n}"], flush=True)

from igdm_tpu.data.images import save_sample_grid
out = sample_flow(params, jax.random.PRNGKey(0), num_images=64, steps=2, method="euler")
s01 = np.clip((np.asarray(out)[..., 0] + 1.0) / 2.0, 0.0, 1.0)
save_sample_grid(s01, "/root/repo/artifacts/samples_reflow_euler2.png")

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

from igdm_tpu.sampling.flow import make_flow_sampler

perf = {}
for method, n, R, dt in (
    ("euler", 1, 100, "bf16"), ("euler", 2, 60, "bf16"),
    ("euler", 4, 40, "bf16"), ("euler", 8, 20, "bf16"),
    ("euler", 2, 60, "f32"),
):
    cdt = jnp.bfloat16 if dt == "bf16" else None
    fn = make_flow_sampler(
        params, num_images=batch, steps=n, method=method, compute_dtype=cdt)
    t = timeit(fn, R)
    perf[f"{method}-{n}-{dt}"] = {
        "s_per_traj": round(t, 5), "samples_per_sec": round(batch / t, 1)}
    print(f"perf {method}-{n}-{dt}:", perf[f"{method}-{n}-{dt}"], flush=True)

with open("/root/repo/artifacts/reflow_quality.json", "w") as f:
    json.dump({"quality": rows, "perf_batch256": perf,
               "train": {"epochs": res.epochs_run, "final_loss": float(res.losses[-1]),
                         "num_pairs": 4096, "coupling": "heun-64"}}, f, indent=1)
print("done")
