"""Round-5 frame correction: re-score every committed headline checkpoint
against the FRAME-MATCHED dataset (clip(raw, 0, 1) — the same affine chain
the dispatcher applies to samples; BASELINE.md round-5 frame correction).

Produces artifacts/quality_corrected.json: one authoritative 512x3
error-bar table for all committed operating points + two controls
(real images in-frame, and the dataset pushed through the model-space
display chain = a perfect generator) that must both score ~0.

Run from /root/repo (one TPU process): python _scratch/eval_corrected_frame.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from igdm_tpu.data.cifar import upscale_2x
from igdm_tpu.data.mat import load_synthetic_images
from igdm_tpu.sampling.auto import sample_from_checkpoint
from igdm_tpu.utils.quality import evaluate_sampler

raw = load_synthetic_images()[..., 0]
d32 = np.clip(raw, 0.0, 1.0)
d64 = np.clip(upscale_2x(raw[..., None])[..., 0], 0.0, 1.0)
OUT = {"frame": "clip(raw,0,1) — matched to the dispatcher display chain"}


def score(tag, path, dataset, **kw):
    def fn(key, n):
        imgs01, _ = sample_from_checkpoint(path, key, num_images=n, **kw)
        return imgs01

    rep = evaluate_sampler(fn, dataset, n_samples=512, seeds=(0, 1, 2), batch=256)
    OUT[tag] = rep
    print(f"{tag:28s} nn_mse {rep['nn_mse']['mean']:.4f}±{rep['nn_mse']['std']:.4f} "
          f"cov {rep['coverage']['mean']:.3f}±{rep['coverage']['std']:.3f}", flush=True)


# controls: both must be ~0 nn_mse in the corrected frame
rng = np.random.default_rng(0)
OUT["control_real"] = evaluate_sampler(
    lambda key, n: d32[rng.integers(0, len(d32), n)], d32,
    n_samples=512, seeds=(0, 1, 2), batch=256)
perfect = (np.clip(2.0 * raw - 1.0, -1.0, 1.0) + 1.0) / 2.0
OUT["control_perfect_chain"] = evaluate_sampler(
    lambda key, n: perfect[rng.integers(0, len(perfect), n)], d32,
    n_samples=512, seeds=(0, 1, 2), batch=256)
for c in ("control_real", "control_perfect_chain"):
    print(f"{c}: nn_mse {OUT[c]['nn_mse']['mean']:.6f} cov {OUT[c]['coverage']['mean']:.3f}", flush=True)

A = "artifacts"
# pixel 32x32 families
score("pix-textbook500", f"{A}/quality3_model_sampling.npz", d32, sampler="textbook", prefer_ema=True)
score("pix-dpmpp10", f"{A}/quality3_model_sampling.npz", d32, sampler="dpmpp", ddim_steps=10, prefer_ema=True)
score("pix-distilled8", f"{A}/distilled8_model.npz", d32)
score("pix-reflow1", f"{A}/reflow64_model.npz", d32, steps=1)
score("pix-flow-euler8", f"{A}/flow64_model.npz", d32, ddim_steps=8, prefer_ema=True)
score("pix-cd1", f"{A}/consistency_model.npz", d32)
# latent 32x32 families
score("latent-ancestral500", f"{A}/latent_model.npz", d32, sampler="textbook", prefer_ema=True)
score("latent-ddim50", f"{A}/latent_model.npz", d32, ddim_steps=50, prefer_ema=True)
score("latent-ddim50-eta1", f"{A}/latent_model.npz", d32, ddim_steps=50, eta=1.0, prefer_ema=True)
score("latent-ddim250-eta1", f"{A}/latent_model.npz", d32, ddim_steps=250, eta=1.0, prefer_ema=True)
score("latent-ddim250-eta0", f"{A}/latent_model.npz", d32, ddim_steps=250, prefer_ema=True)
score("lcm-1", f"{A}/lcm_model.npz", d32)
score("latent-reflow1", f"{A}/latent_reflow_model.npz", d32, steps=1)
score("latent-flow-euler8", f"{A}/latent_flow_model.npz", d32, ddim_steps=8, prefer_ema=True)
# 64x64 rows
score("pix64-mid-attn-ddim50", f"{A}/model64_attn.npz", d64, ddim_steps=50, prefer_ema=True)
score("pix64-noattn-ddim50", f"{A}/model64.npz", d64, ddim_steps=50, prefer_ema=True)
score("pix64-attn32-ddim50", f"{A}/model64_attn32.npz", d64, ddim_steps=50, prefer_ema=True)
score("latent64-ancestral500", f"{A}/latent64_model.npz", d64, sampler="textbook", prefer_ema=True)
score("latent64-flow-euler8", f"{A}/latent64_flow_model.npz", d64, ddim_steps=8, prefer_ema=True)
score("latent64-reflow1", f"{A}/latent64_reflow_model.npz", d64, steps=1)
score("lcm64-1", f"{A}/lcm64_model.npz", d64)

# Conditional purity, corrected frame. PROTOCOL NOTE: the pseudo-labels
# must be the TRAINING-TIME clustering (cli/train.py clusters (imgs+1)/2
# of the raw/upscaled images) — the model is conditioned on those exact
# cluster ids; re-deriving k-means labels from a different frame scores a
# category error (measured: re-derived labels read chance-level purity on
# a model that is 3.8x chance under its own labels).
from igdm_tpu.data.labels import kmeans_labels
from igdm_tpu.utils.quality import evaluate_guided_purity

raw4 = load_synthetic_images()
raw64 = upscale_2x(raw4)


def purity(tag, path, dataset, labels, s):
    def gfn(key, want):
        outs = []
        for w in np.unique(want):
            n = int((want == w).sum())
            im, _ = sample_from_checkpoint(
                path, jax.random.fold_in(key, int(w)), num_images=n,
                label=int(w), guidance_scale=s, ddim_steps=50)
            outs.append((w, im))
        res = np.zeros((len(want),) + outs[0][1].shape[1:], np.float32)
        for w, im in outs:
            res[want == w] = im
        return res

    rep = evaluate_guided_purity(gfn, dataset, labels, n_samples=512,
                                 seeds=(0, 1, 2), batch=128)
    OUT[tag] = rep
    print(f"{tag}: {rep['mean']:.3f}±{rep['std']:.3f} (chance {rep['chance']:.3f})",
          flush=True)


purity("latent-cond-purity-s16-trainlabels", f"{A}/latent_cond_model.npz",
       d32, kmeans_labels((raw4 + 1.0) / 2.0, k=8, seed=0), 16.0)
purity("latent64-cond-purity-s4-trainlabels", f"{A}/latent64_cond_model.npz",
       d64, kmeans_labels((raw64 + 1.0) / 2.0, k=8, seed=0), 4.0)

with open("artifacts/quality_corrected.json", "w") as f:
    json.dump(OUT, f, indent=1)
print("wrote artifacts/quality_corrected.json", flush=True)
