"""Round-5: score the 64x64 latent family (VERDICT r4 task 2).

Produces artifacts/latent64_quality.json: 512x3 error-bar rows for the
64x64 latent DDPM (ddim-50 + ancestral-500), latent flow (euler-8) and
latent reflow (euler-1/2), against the 2x-upscaled dataset — the same
protocol as the pixel 64x64 rows (BASELINE.md) — plus serving rates at
the round-5 operating points.

Run: python _scratch/eval_latent64.py /tmp/latent64
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

run_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/latent64"
out = {}

d01 = load_synthetic_images()[..., 0]
d01 = np.clip(upscale_2x(d01[..., None])[..., 0], 0.0, 1.0)  # (500, 64, 64), frame-matched (round-5 correction)
print("dataset:", d01.shape, flush=True)


def score(tag, path, **kw):
    def fn(key, n):
        imgs01, _ = sample_from_checkpoint(path, key, num_images=n, **kw)
        return imgs01

    rep = evaluate_sampler(fn, d01, n_samples=512, seeds=(0, 1, 2), batch=256)
    out[tag] = rep
    print(f"{tag}: nn_mse {rep['nn_mse']['mean']:.4f}±{rep['nn_mse']['std']:.4f} "
          f"cov {rep['coverage']['mean']:.3f}±{rep['coverage']['std']:.3f}", flush=True)


ldm = os.path.join(run_dir, "latent_model.npz")
flow = os.path.join(run_dir, "latent_flow_model.npz")
reflow = os.path.join(run_dir, "reflow_model.npz")

score("ldm64-ddim50", ldm, ddim_steps=50, prefer_ema=True)
score("ldm64-ancestral500", ldm, sampler="textbook", prefer_ema=True)
score("lflow64-euler8", flow, ddim_steps=8, prefer_ema=True)
score("lreflow64-euler1", reflow, ddim_steps=1, prefer_ema=True)
score("lreflow64-euler2", reflow, ddim_steps=2, prefer_ema=True)

# serving rates at the round-5 operating points (in-program repeat harness)
import bench
from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.config import DiffusionConfig, config_from_dict
from igdm_tpu.models import autoencoder
from igdm_tpu.sampling.flow import make_flow_sampler
from igdm_tpu.sampling.latent import make_latent_sampler
from igdm_tpu.training.latent import load_autoencoder, resolve_ae_path

params, state, meta = load_for_sampling(ldm, prefer_ema=True)
params = jax.tree_util.tree_map(jax.numpy.asarray, params)
ae_params, _ = load_autoencoder(resolve_ae_path(ldm, meta["latent"]))
cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
dm = meta.get("data", {})
serving = {}
for B, R, cd in [(256, 8, None), (1024, 4, None), (1024, 4, jax.numpy.bfloat16)]:
    fn = make_latent_sampler(
        params, ae_params, cfg=cfg, scale=float(meta["latent"]["scale"]),
        num_images=B, latent_size=tuple(dm.get("image_size", (16, 16))),
        latent_ch=int(dm.get("channels", 4)), method="ancestral",
        model_state=state, compute_dtype=cd)
    key = f"t500_b{B}_{'bf16' if cd is not None else 'f32'}"
    serving[key] = round(bench._time_scan_repeat(fn, B, R), 1)
    print(f"serving {key}: {serving[key]} samples/s", flush=True)

rp, _, rmeta = load_for_sampling(reflow, prefer_ema=True)
rp = jax.tree_util.tree_map(jax.numpy.asarray, rp)
r_ae, _ = load_autoencoder(resolve_ae_path(reflow, rmeta["latent"]))
rdm = rmeta.get("data", {})
rscale = float(rmeta["latent"]["scale"])
for B, cd in [(256, None), (1024, None), (1024, jax.numpy.bfloat16)]:
    zfn = make_flow_sampler(
        rp, num_images=B, steps=1, method="euler",
        time_scale=float(rmeta["flow"].get("time_scale", 1000.0)),
        image_size=tuple(rdm.get("image_size", (16, 16))),
        channels=int(rdm.get("channels", 4)), compute_dtype=jax.numpy.bfloat16)
    f = lambda key: autoencoder.decode(r_ae, zfn(key) / rscale, compute_dtype=cd)
    key = f"reflow1_b{B}_{'bf16' if cd is not None else 'f32'}dec"
    serving[key] = round(bench._time_scan_repeat(f, B, 30), 1)
    print(f"serving {key}: {serving[key]} samples/s", flush=True)
out["serving64"] = serving

# sample grids for the artifact record
from igdm_tpu.data.images import save_sample_grid
for tag, path, kw in [
    ("latent64", ldm, dict(sampler="textbook", prefer_ema=True)),
    ("latent64_reflow1", reflow, dict(ddim_steps=1, prefer_ema=True)),
]:
    imgs01, _ = sample_from_checkpoint(path, jax.random.PRNGKey(0), num_images=16, **kw)
    save_sample_grid(imgs01, f"/root/repo/artifacts/samples_{tag}.png")
    print(f"grid saved samples_{tag}.png", flush=True)

with open("/root/repo/artifacts/latent64_quality.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote artifacts/latent64_quality.json", flush=True)
