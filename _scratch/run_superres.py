"""SR3 x2 upscaler demo on the real chip: 32->64 on the reference dataset,
PSNR vs the bicubic baseline."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.data.cifar import upscale_2x
from igdm_tpu.data.images import save_sample_grid
from igdm_tpu.training.superres import train_superres, make_lowres
from igdm_tpu.sampling.superres import sample_superres
from igdm_tpu.checkpoint.pytree_io import load_for_sampling

raw = load_synthetic_images("SyntheticImages500.mat")
# true [-1,1] scaling: the reference's x2-1 leaves the data spanning
# [-3.14, 1.28], which fights the samplers' conventional [-1,1] clip
lo_v, hi_v = raw.min(), raw.max()
scaled = (2.0 * (raw - lo_v) / (hi_v - lo_v) - 1.0).astype('float32')
hr = upscale_2x(scaled)  # (500, 64, 64, 1) in [-1, 1]
print("HR dataset:", hr.shape, flush=True)

diff_cfg = DiffusionConfig(num_steps=500, schedule="cosine")
train_cfg = TrainConfig(
    epochs=1500, batch_size=64, lr=2e-4, patience=10_000, min_delta=0.0,
    ema_decay=0.9995, compute_dtype="bfloat16", epochs_per_dispatch=25,
)
t0 = time.time()
res = train_superres(
    hr, 4, diff_cfg, train_cfg, base_ch=32,
    out_dir="/root/repo/artifacts", save_final="superres_model", log=None,
)
print(f"trained {res.epochs_run} epochs in {time.time()-t0:.0f}s, "
      f"final loss {res.losses[-1]:.4f}", flush=True)

params, _, meta = load_for_sampling("artifacts/superres_model.npz", prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)
lo = make_lowres(jnp.asarray(hr[:16]), 4)
out = sample_superres(params, lo, jax.random.PRNGKey(3), cfg=diff_cfg,
                      factor=4, num_sample_steps=50)
sr = np.asarray(out)
out_eta = sample_superres(params, lo, jax.random.PRNGKey(3), cfg=diff_cfg,
                          factor=4, num_sample_steps=50, eta=1.0)
sr_eta = np.asarray(out_eta)

from igdm_tpu.training.superres import upsample_to
bicubic = np.clip(np.asarray(upsample_to(lo, (64, 64))), -1, 1)

def psnr(a, b):
    mse = np.mean((a - b) ** 2)  # signals span [-1,1] -> peak-to-peak 2
    return float(10 * np.log10(4.0 / mse))

row = {"psnr_sr3_ddim": psnr(sr, hr[:16]), "psnr_sr3_eta1": psnr(sr_eta, hr[:16]),
       "psnr_bicubic": psnr(bicubic, hr[:16]),
       "wall_s": round(time.time() - t0, 1)}
grid = np.concatenate([ (bicubic[:8,...,0]+1)/2, (sr[:8,...,0]+1)/2,
                        (hr[:8,...,0]+1)/2 ])
save_sample_grid(grid, "/root/repo/artifacts/samples_superres_x2.png",
                 title="rows: bicubic | SR3 x2 | ground truth")
print(json.dumps(row), flush=True)
