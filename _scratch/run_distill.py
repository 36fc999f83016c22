"""On-chip demo: progressively distill the round-2 quality flagship to 8 steps.
Logs to /tmp/distill.log; saves the student after every phase."""
import dataclasses, json, time, sys
import numpy as np
import jax, jax.numpy as jnp
import optax
from igdm_tpu.checkpoint.pytree_io import load_for_sampling, _flatten_with_paths
from igdm_tpu.config import DiffusionConfig, config_from_dict
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.training.distill import make_distill_step_fn, _phase_grids
from igdm_tpu.sampling.ancestral import sample_distilled
from igdm_tpu.utils.quality import evaluate_samples

LOG = open("/tmp/distill.log", "a")
def log(*a):
    print(*a, file=LOG, flush=True)
    print(*a, flush=True)

params, state, meta = load_for_sampling("artifacts/quality3_model_sampling.npz", prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)
cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
obj = (meta.get("train_cfg") or {}).get("objective", "eps")
log("flagship:", meta.get("model"), cfg.schedule, "T=", cfg.num_steps, "obj=", obj)

imgs = jnp.asarray(normalize_pm1(load_synthetic_images("SyntheticImages500.mat")))
dataset01 = (np.asarray(imgs)[..., 0] + 1.0) / 2.0

PHASES = (64, 32, 16, 8)
STEPS = 1200
grids = _phase_grids(cfg.num_steps, PHASES)

def save_student(student, grid, tag):
    payload = {f"params/{k}": np.asarray(v) for k, v in _flatten_with_paths(student).items()}
    smeta = dict(meta)
    smeta["distill"] = {"grid": [int(x) for x in grid], "objective": "v",
                        "teacher": "quality3_model_sampling.npz"}
    smeta["train_cfg"] = dict(smeta.get("train_cfg") or {}, objective="v")
    payload["__meta__"] = np.frombuffer(json.dumps(smeta).encode(), dtype=np.uint8)
    np.savez(f"/root/repo/artifacts/distilled{tag}_model.npz", **payload)

student = jax.tree_util.tree_map(jnp.array, params)
teacher = params
teacher_obj = obj
for (sgrid, tgrid), n in zip(grids, PHASES):
    t0 = time.time()
    tx = optax.adam(1e-4)
    opt_state = tx.init(student)
    run = make_distill_step_fn(tx, cfg, 64, sgrid, tgrid, teacher_obj,
                               model_kind="unet4", compute_dtype="bfloat16",
                               steps_per_dispatch=100)
    first = last = None
    done = 0
    while done < STEPS:
        student, opt_state, losses = run(student, opt_state, teacher, imgs,
                                         jax.random.fold_in(jax.random.PRNGKey(7), n),
                                         jnp.asarray(done, jnp.int32))
        l = np.asarray(losses)
        if first is None:
            first = float(l[0])
        last = float(l[-10:].mean())
        done += int(l.shape[0])
    log(f"phase N={n}: loss {first:.4f} -> {last:.4f}, {done} steps, {time.time()-t0:.0f}s")
    save_student(student, sgrid, n)
    teacher = jax.tree_util.tree_map(jnp.array, student)
    teacher_obj = "v"

grid = grids[-1][0]
out = sample_distilled(student, grid, jax.random.PRNGKey(11), num_images=64, cfg=cfg, model_kind="unet4")
s01 = (np.asarray(out)[..., 0] + 1.0) / 2.0
log("student 8-step:", evaluate_samples(s01, dataset01))
from igdm_tpu.data.images import save_sample_grid
save_sample_grid(s01, "/root/repo/artifacts/samples_distilled8.png")
log("saved artifacts")
