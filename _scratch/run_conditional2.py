"""Conditional demo, take 2: k=4 balanced pseudo-classes, 3x the steps,
multi-epoch dispatch."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.data.labels import kmeans_labels
from igdm_tpu.data.images import save_sample_grid
from igdm_tpu.training.conditional import train_conditional_ddpm
from igdm_tpu.sampling.auto import sample_from_checkpoint

raw = load_synthetic_images("SyntheticImages500.mat")
imgs = normalize_pm1(raw)
K = 4
labels = kmeans_labels((raw + 1.0) / 2.0, k=K, seed=0)
print("cluster sizes:", np.bincount(labels, minlength=K).tolist(), flush=True)

diff_cfg = DiffusionConfig(num_steps=500, schedule="cosine")
train_cfg = TrainConfig(
    epochs=1800, batch_size=64, lr=2e-4, patience=10_000, min_delta=0.0,
    ema_decay=0.9995, compute_dtype="bfloat16", epochs_per_dispatch=25,
)
t0 = time.time()
res = train_conditional_ddpm(
    imgs, labels, K, diff_cfg, train_cfg, drop_prob=0.1, base_ch=32,
    out_dir="/root/repo/artifacts", save_final="conditional_model",
    log=None,
)
print(f"trained {res.epochs_run} epochs in {time.time()-t0:.0f}s, "
      f"final loss {res.losses[-1]:.4f}", flush=True)

d01 = (raw[..., 0] + 1.0) / 2.0
flat_d = d01.reshape(len(d01), -1)
cents = np.stack([flat_d[labels == j].mean(0) for j in range(K)])

row = {"chance": 1.0 / K}
for s in (0.0, 2.0, 4.0, 6.0, 8.0):
    s01, info = sample_from_checkpoint(
        "artifacts/conditional_model.npz", jax.random.PRNGKey(5),
        num_images=64, ddim_steps=50, prefer_ema=True, guidance_scale=s,
    )
    fo = s01.reshape(len(s01), -1)
    req = np.asarray(info["labels"])
    nn = ((fo[:, None, :] - flat_d[None, :, :]) ** 2).mean(-1).argmin(1)
    cent = ((fo[:, None, :] - cents[None, :, :]) ** 2).mean(-1).argmin(1)
    row[f"nn_purity_cfg{s:g}"] = float((labels[nn] == req).mean())
    row[f"centroid_purity_cfg{s:g}"] = float((cent == req).mean())
    if s == 2.0:
        save_sample_grid(s01, "/root/repo/artifacts/samples_conditional_cfg2.png",
                         title="CFG guidance 2.0 - classes cycle 0..3")
print(json.dumps(row), flush=True)
