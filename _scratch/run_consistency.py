"""Consistency-distill the sampling flagship (quality3, unet4-64 cosine
T=500 eps) and evaluate the 1/2/4-call samplers with the distill-ladder
quality protocol (d01 from RAW data, samples clip01((x+1)/2))."""
import json, time
import numpy as np
import jax, jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from igdm_tpu.checkpoint.pytree_io import load_for_sampling, _flatten_with_paths
from igdm_tpu.config import DiffusionConfig, config_from_dict
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.training.consistency import SIGMA_DATA, consistency_distill
from igdm_tpu.sampling.consistency import make_consistency_sampler, sample_consistency
from igdm_tpu.utils.quality import evaluate_samples
from igdm_tpu.data.images import save_sample_grid

LOG = open("/tmp/consistency.log", "a")
def log(*a):
    print(*a, file=LOG, flush=True)

params, state, meta = load_for_sampling(
    "artifacts/quality3_model_sampling.npz", prefer_ema=True
)
params = jax.tree_util.tree_map(jnp.asarray, params)
cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
raw = load_synthetic_images("SyntheticImages500.mat")
d01 = (raw[..., 0] + 1.0) / 2.0
imgs = jnp.asarray(normalize_pm1(raw))

t0 = time.time()
student, grid, losses = consistency_distill(
    params, imgs, diff_cfg=cfg, objective="eps", n_grid=18,
    steps=8000, batch_size=128, lr=1e-4, model_kind="unet4",
    compute_dtype="bfloat16", steps_per_dispatch=250,
    key=jax.random.PRNGKey(7), log=log,
)
wall = time.time() - t0
log(f"CD done in {wall:.0f}s, loss {losses[0]:.3f} -> {np.mean(losses[-250:]):.3f}")

out = {"train_wall_s": round(wall, 1), "steps": len(losses), "n_grid": 18,
       "loss_first": round(float(np.mean(losses[:250])), 4),
       "loss_last": round(float(np.mean(losses[-250:])), 4)}
for n in (1, 2, 4):
    o = sample_consistency(
        student, grid, jax.random.PRNGKey(11), num_images=64, steps=n, cfg=cfg,
        model_kind="unet4",
    )
    s01 = np.clip((np.asarray(o)[..., 0] + 1.0) / 2.0, 0.0, 1.0)
    m = evaluate_samples(s01, d01)
    out[f"cd-{n}"] = {k: round(float(v), 4) for k, v in m.items()}
    log(f"cd-{n}:", out[f"cd-{n}"])
    if n in (1, 2):
        save_sample_grid(s01, f"/root/repo/artifacts/samples_consistency{n}.png")

# serving throughput: baked bf16 sampler, in-program repeat (design.md timing)
fn = make_consistency_sampler(
    student, grid, cfg=cfg, num_images=256, steps=1, model_kind="unet4",
    compute_dtype=jnp.bfloat16,
)
R = 100
@jax.jit
def multi(key):
    def body(acc, i):
        return acc + jnp.mean(fn(jax.random.fold_in(key, i))), None
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
    return acc
k = jax.random.PRNGKey(0)
float(np.asarray(multi(k)))
times = []
for i in range(3):
    t0 = time.perf_counter()
    float(np.asarray(multi(jax.random.fold_in(k, 100 + i))))
    times.append(time.perf_counter() - t0)
out["serving1_samples_per_sec"] = round(256.0 / (min(times) / R), 1)
log("serving:", out["serving1_samples_per_sec"], "samples/s")

# save the student checkpoint with dispatchable metadata
payload = {f"params/{k2}": np.asarray(v) for k2, v in _flatten_with_paths(student).items()}
smeta = {
    "model": "unet4",
    "diff_cfg": meta.get("diff_cfg", {}),
    "data": meta.get("data", {}),
    "consistency": {
        "grid": [int(g) for g in grid], "sigma_data": SIGMA_DATA,
        "teacher": "artifacts/quality3_model_sampling.npz",
        "steps_trained": len(losses),
    },
}
payload["__meta__"] = np.frombuffer(json.dumps(smeta).encode(), dtype=np.uint8)
np.savez("/root/repo/artifacts/consistency_model.npz", **payload)

with open("/root/repo/artifacts/consistency_quality.json", "w") as f:
    json.dump(out, f, indent=1)
log("done", json.dumps(out))
print(json.dumps(out))
