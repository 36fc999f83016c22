"""Round-5: complete the 64x64 composition matrix.

(a) fill the unmeasured t500 serving cells (bf16 @ batch 256/512);
(b) LCM-64: consistency-distill the 64x64 latent teacher, score 512x3 +
    serving rate; (c) conditional latent 64 (CFG in 16x16 latent space):
    train + purity at s in {1,4,8} + sample grid.

Run from /root/repo (one TPU process): python _scratch/run_latent64_matrix.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench
from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.config import DiffusionConfig, config_from_dict
from igdm_tpu.sampling.latent import make_latent_sampler
from igdm_tpu.training.latent import load_autoencoder, resolve_ae_path

OUT = {}
run = "/tmp/latent64"

# ---- (a) unmeasured t500 cells
ldm = f"{run}/latent_model.npz"
params, state, meta = load_for_sampling(ldm, prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)
ae_params, _ = load_autoencoder(resolve_ae_path(ldm, meta["latent"]))
cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
dm = meta.get("data", {})
cells = {}
for B, cd in [(256, jnp.bfloat16), (512, None), (512, jnp.bfloat16)]:
    fn = make_latent_sampler(
        params, ae_params, cfg=cfg, scale=float(meta["latent"]["scale"]),
        num_images=B, latent_size=tuple(dm.get("image_size", (16, 16))),
        latent_ch=int(dm.get("channels", 4)), method="ancestral",
        model_state=state, compute_dtype=cd)
    k = f"t500_b{B}_{'bf16' if cd is not None else 'f32'}"
    cells[k] = round(bench._time_scan_repeat(fn, B, 6), 1)
    print(f"{k}: {cells[k]}", flush=True)
OUT["t500_cells"] = cells

# ---- (b) LCM-64
from igdm_tpu.cli.train import main as train_main

if not os.path.isfile(f"{run}/consistency_model.npz"):
    rc = train_main([
        "--model", "consistency", "--teacher", ldm, "--image-size", "64",
        "--out-dir", run,
    ])
    assert rc == 0, "LCM-64 training failed"

from igdm_tpu.data.cifar import upscale_2x
from igdm_tpu.data.mat import load_synthetic_images
from igdm_tpu.sampling.auto import sample_from_checkpoint
from igdm_tpu.utils.quality import evaluate_sampler

d01 = load_synthetic_images()[..., 0]
d01 = np.clip(upscale_2x(d01[..., None])[..., 0], 0.0, 1.0)  # frame-matched (round-5 correction)

def fn64(key, n):
    imgs01, _ = sample_from_checkpoint(
        f"{run}/consistency_model.npz", key, num_images=n)
    return imgs01

rep = evaluate_sampler(fn64, d01, n_samples=512, seeds=(0, 1, 2), batch=256)
OUT["lcm64_1call"] = rep
print(f"lcm64-1: nn_mse {rep['nn_mse']['mean']:.4f} cov {rep['coverage']['mean']:.3f}", flush=True)

# LCM-64 serving (1 call + decode, round-5 operating point)
OUT["lcm64_serving_b1024_bf16dec"] = round(
    bench.bench_lcm(f"{run}/consistency_model.npz", batch=1024, R=30), 1)
print("lcm64 serving:", OUT["lcm64_serving_b1024_bf16dec"], flush=True)

# ---- (c) conditional latent 64
if not os.path.isfile(f"{run}/latent_cond_model.npz"):
    rc = train_main([
        "--model", "latent", "--conditional", "--classes", "8",
        "--image-size", "64", "--ae", f"{run}/ae_model.npz",
        "--kl-weight", "1e-2", "--epochs", "10000", "--schedule", "cosine",
        "--ema-decay", "0.9995", "--compute-dtype", "bfloat16",
        "--epochs-per-dispatch", "100", "--patience", "100000",
        "--out-dir", run,
    ])
    assert rc == 0, "conditional latent 64 training failed"

from igdm_tpu.data.labels import kmeans_labels
from igdm_tpu.utils.quality import evaluate_guided_purity

labels = kmeans_labels(d01, k=8, seed=0)

purity = {}
for s in (1.0, 4.0, 8.0):
    # labels must be requested per-sample: use the dispatcher's label arg
    def gfn(key, want):
        outs = []
        for w in np.unique(want):
            n = int((want == w).sum())
            im, _ = sample_from_checkpoint(
                f"{run}/latent_cond_model.npz", jax.random.fold_in(key, int(w)),
                num_images=n, label=int(w), guidance_scale=s, ddim_steps=50)
            outs.append((w, im))
        # reassemble in want order
        res = np.zeros((len(want),) + outs[0][1].shape[1:], np.float32)
        for w, im in outs:
            res[want == w] = im
        return res
    purity[f"s{s:g}"] = evaluate_guided_purity(
        gfn, d01, labels, n_samples=256, seeds=(0, 1), batch=128)
    print(f"cond64 purity s={s:g}: {purity[f's{s:g}']['mean']:.3f} "
          f"(chance {purity[f's{s:g}']['chance']:.3f})", flush=True)
OUT["cond64_purity"] = purity

from igdm_tpu.data.images import save_sample_grid
im, _ = sample_from_checkpoint(
    f"{run}/latent_cond_model.npz", jax.random.PRNGKey(0), num_images=16,
    guidance_scale=4.0, ddim_steps=50)
save_sample_grid(im, "/root/repo/artifacts/samples_latent64_cond_cfg4.png")

with open("/root/repo/artifacts/latent64_matrix.json", "w") as f:
    json.dump(OUT, f, indent=1)
print("wrote artifacts/latent64_matrix.json", flush=True)
