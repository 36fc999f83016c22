"""Conditional-generation demo on the real chip: k-means pseudo-classes on
the 500-image reference dataset, class-conditional unet4-32 + CFG sampling,
per-class sample grid + per-class purity metric."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.data.labels import kmeans_labels
from igdm_tpu.data.images import save_sample_grid
from igdm_tpu.training.conditional import train_conditional_ddpm
from igdm_tpu.sampling.guided import sample_cfg

raw = load_synthetic_images("SyntheticImages500.mat")
imgs = normalize_pm1(raw)
K = 8
labels = kmeans_labels((raw + 1.0) / 2.0, k=K, seed=0)
print("cluster sizes:", np.bincount(labels, minlength=K).tolist(), flush=True)

diff_cfg = DiffusionConfig(num_steps=500, schedule="cosine")
train_cfg = TrainConfig(
    epochs=600, batch_size=64, lr=2e-4, patience=10_000, min_delta=0.0,
    ema_decay=0.999, compute_dtype="bfloat16",
)
t0 = time.time()
res = train_conditional_ddpm(
    imgs, labels, K, diff_cfg, train_cfg, drop_prob=0.1, base_ch=32,
    out_dir="/root/repo/artifacts", save_final="conditional_model",
    log=None,
)
print(f"trained {res.epochs_run} epochs in {time.time()-t0:.0f}s, "
      f"final loss {res.losses[-1]:.4f}", flush=True)

params = res.state.ema_params if res.state.ema_params is not None else res.state.params
# 8 samples per class, guidance 2.0
lab = jnp.asarray(np.repeat(np.arange(K), 8))
out = sample_cfg(params, jax.random.PRNGKey(5), lab, guidance_scale=2.0,
                 cfg=diff_cfg, num_sample_steps=50)
s01 = (np.asarray(out)[..., 0] + 1.0) / 2.0
save_sample_grid(s01, "/root/repo/artifacts/samples_conditional_cfg2.png", cols=8)

# class purity: nearest dataset neighbor's cluster should match the
# requested label far above the 1/K chance rate
d01 = (raw[..., 0] + 1.0) / 2.0
flat_d = d01.reshape(len(d01), -1)
flat_s = s01.reshape(len(s01), -1)
nn = ((flat_s[:, None, :] - flat_d[None, :, :]) ** 2).mean(-1).argmin(1)
purity = float((labels[nn] == np.asarray(lab)).mean())
print(json.dumps({"purity": purity, "chance": 1.0 / K,
                  "epochs": res.epochs_run, "final_loss": res.losses[-1],
                  "wall_s": round(time.time() - t0, 1)}), flush=True)
