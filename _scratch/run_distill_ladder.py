"""Re-run the proven distillation recipe, snapshotting EVERY student on the
ladder (64/32/16/8 steps) + per-N quality metrics. Replaces the stale
distilled{16,32,64} artifacts (saved mid-way through a diverged earlier run).
"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from igdm_tpu.checkpoint.pytree_io import load_for_sampling, _flatten_with_paths
from igdm_tpu.config import DiffusionConfig, config_from_dict
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.training.distill import distill_ddpm
from igdm_tpu.sampling.ancestral import sample_distilled
from igdm_tpu.utils.quality import evaluate_samples
from igdm_tpu.data.images import save_sample_grid

LOG = open("/tmp/distill_ladder.log", "a")
def log(*a):
    print(*a, file=LOG, flush=True)

params, state, meta = load_for_sampling("artifacts/quality3_model_sampling.npz", prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)
cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
raw = load_synthetic_images("SyntheticImages500.mat")
d01 = (raw[..., 0] + 1.0) / 2.0
imgs = jnp.asarray(normalize_pm1(raw))

t0 = time.time()
ladder = {}
student, grid, losses = distill_ddpm(
    params, imgs, diff_cfg=cfg, objective="eps",
    phases=(64, 32, 16, 8), steps_per_phase=3000, convert_steps=3000,
    batch_size=128, lr=1e-4, model_kind="unet4", compute_dtype=None,
    steps_per_dispatch=250, key=jax.random.PRNGKey(7), log=log,
    on_phase_end=lambda n, p, g: ladder.update({n: (jax.tree_util.tree_map(jnp.array, p), np.asarray(g))}),
)
wall = time.time() - t0
log(f"ladder done in {wall:.0f}s")

metrics = {}
for n, (p, g) in sorted(ladder.items()):
    o = sample_distilled(p, g, jax.random.PRNGKey(11), num_images=64, cfg=cfg, model_kind="unet4")
    s01 = (np.asarray(o)[..., 0] + 1.0) / 2.0
    m = evaluate_samples(s01, d01)
    metrics[n] = m
    log(f"student {n}-step:", m)
    payload = {f"params/{k}": np.asarray(v) for k, v in _flatten_with_paths(p).items()}
    smeta = dict(meta)
    smeta["distill"] = {"grid": [int(x) for x in g], "objective": "v",
                        "teacher": "quality3_model_sampling.npz", "wall_seconds": round(wall, 1),
                        "recipe": "convert3000 + 4x3000 steps batch128 f32 lr1e-4 key7"}
    smeta["train_cfg"] = dict(smeta.get("train_cfg") or {}, objective="v")
    payload["__meta__"] = np.frombuffer(json.dumps(smeta).encode(), dtype=np.uint8)
    np.savez(f"/root/repo/artifacts/distilled{n}_model.npz", **payload)
    if n == 8:
        save_sample_grid(s01, "/root/repo/artifacts/samples_distilled8.png")
log("metrics:", json.dumps({str(k): v for k, v in metrics.items()}))
print(json.dumps({str(k): v for k, v in metrics.items()}))
