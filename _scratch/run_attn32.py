"""Round-4 FlashAttention production consumer (VERDICT r3 task 3): train
the 64x64 stretch config with attention at the 32x32 feature level
(unet4-32, attn_levels=(2,) -> N=1024 tokens, the flash crossover), then:
  * quality (DDIM-50, 512 samples x 3 seeds) vs the no-attention and
    bottleneck-attention round-2 baselines under the same protocol,
  * train-step and sampling device time with flash vs forced-XLA attention.
Writes artifacts/attn32_quality.json + model64_attn32.npz (sampling-only).
Run via the TPU runner (reloads the edited modules first)."""
import importlib, json, shutil, time

import numpy as np
import jax, jax.numpy as jnp

import igdm_tpu.models.unet4 as u4
importlib.reload(u4)
import igdm_tpu.training.ddpm as ddpm_mod
importlib.reload(ddpm_mod)

from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.data.cifar import upscale_2x
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.checkpoint.pytree_io import load_for_sampling, strip_for_sampling
from igdm_tpu.sampling.ancestral import sample_ddim
from igdm_tpu.utils.prof import device_module_ms, profile_trace
from igdm_tpu.utils.quality import evaluate_sampler

A = "/root/repo/artifacts"
raw = load_synthetic_images("/root/repo/SyntheticImages500.mat")
imgs64 = upscale_2x(normalize_pm1(raw))
d01_64 = (upscale_2x(raw)[..., 0] + 1.0) / 2.0

diff_cfg = DiffusionConfig(num_steps=500, schedule="cosine")
train_cfg = TrainConfig(
    epochs=300, batch_size=64, lr=2e-4, patience=10_000, min_delta=0.0,
    ema_decay=0.999, compute_dtype="bfloat16", epochs_per_dispatch=10,
)

t0 = time.time()
res = ddpm_mod.train_ddpm(
    imgs64, diff_cfg, train_cfg, attn_levels=(2,), model_kind="unet4",
    base_ch=32, out_dir="/tmp", save_final="model64_attn32_full", log=None,
)
wall = time.time() - t0
print(f"attn32 train: {res.epochs_run} epochs in {wall:.0f}s, "
      f"final loss {res.losses[-1]:.4f}", flush=True)
strip_for_sampling("/tmp/model64_attn32_full.npz", f"{A}/model64_attn32.npz")

out = {"train": {"epochs": res.epochs_run, "wall_s": round(wall, 1),
                 "final_loss": float(res.losses[-1])}}

# --- quality: same 512x3 DDIM-50 protocol for all three 64x64 models
def ddim_fn(params, state):
    return lambda key, n: np.clip(
        (np.asarray(sample_ddim(
            params, state, key, num_images=n, image_size=(64, 64),
            cfg=diff_cfg, num_sample_steps=50, model_kind="unet4",
        ))[..., 0] + 1.0) / 2.0, 0.0, 1.0)

for name, path in (("attn32", f"{A}/model64_attn32.npz"),
                   ("mid_attn", f"{A}/model64_attn.npz"),
                   ("no_attn", f"{A}/model64.npz")):
    p, s, meta = load_for_sampling(path, prefer_ema=True)
    p = jax.tree_util.tree_map(jnp.asarray, p)
    rep = None
    for attempt in range(3):
        try:
            rep = evaluate_sampler(ddim_fn(p, s), d01_64, n_samples=512,
                                   seeds=(0, 1, 2), batch=256)
            break
        except Exception as e:
            print(f"{name}: attempt {attempt} failed: {e}", flush=True)
            time.sleep(5)
    out[name] = rep
    print(name, {k: f"{rep[k]['mean']:.4f}±{rep[k]['std']:.4f}"
                 for k in ("nn_mse", "coverage", "pairwise_diversity")}, flush=True)

# --- flash vs forced-XLA device time (train step fwd+bwd, and DDIM-50)
import igdm_tpu.ops.attention as oa
p, s, _ = load_for_sampling(f"{A}/model64_attn32.npz", prefer_ema=True)
p = jax.tree_util.tree_map(jnp.asarray, p)

from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config
ab = jnp.asarray(alphas_cumprod(betas_for_config(diff_cfg)), jnp.float32)
x0 = jnp.asarray(imgs64[:64])

def loss(params, key):
    kt, ke = jax.random.split(key)
    ts = jax.random.randint(kt, (64,), 1, 501)
    eps = jax.random.normal(ke, x0.shape, jnp.float32)
    a = jnp.sqrt(ab[ts - 1]).reshape(-1, 1, 1, 1)
    sg = jnp.sqrt(1.0 - ab[ts - 1]).reshape(-1, 1, 1, 1)
    x_t = a * x0 + sg * eps
    pred = u4.apply(params, x_t, ts, final_sigmoid=False,
                    compute_dtype=jnp.bfloat16)
    return jnp.mean(jnp.square(pred - eps))

key = jax.random.PRNGKey(0)

timing = {}
real_eligible = oa._flash_eligible
for tag, elig in (("flash", real_eligible), ("xla", lambda *a: False)):
    oa._flash_eligible = elig
    # fresh jit per tag: the routing decision is baked at trace time
    step = jax.jit(jax.grad(loss))
    try:
        step(p, key)["final"]["w"].block_until_ready()
        d = f"/tmp/attn_t_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        with profile_trace(d):
            for i in range(30):
                g = step(p, jax.random.fold_in(key, i))
            g["final"]["w"].block_until_ready()
        timing[f"train_step_ms_{tag}"] = device_module_ms(d) / 30
        shutil.rmtree(d, ignore_errors=True)

        sfn = jax.jit(lambda k: sample_ddim(
            p, s, k, num_images=64, image_size=(64, 64), cfg=diff_cfg,
            num_sample_steps=50, model_kind="unet4"))
        sfn(key).block_until_ready()
        d = f"/tmp/attn_s_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        with profile_trace(d):
            for i in range(5):
                o = sfn(jax.random.fold_in(key, i))
            o.block_until_ready()
        timing[f"ddim50_b64_ms_{tag}"] = device_module_ms(d) / 5
        shutil.rmtree(d, ignore_errors=True)
    finally:
        oa._flash_eligible = real_eligible
    print(tag, {k: round(v, 3) for k, v in timing.items()}, flush=True)

out["timing_device_ms"] = {k: round(v, 3) for k, v in timing.items()}
with open(f"{A}/attn32_quality.json", "w") as f:
    json.dump(out, f, indent=1)

from igdm_tpu.data.images import save_sample_grid
grid = ddim_fn(p, s)(jax.random.PRNGKey(11), 64)
save_sample_grid(grid, f"{A}/samples64_attn32_ddim50.png")
print("attn32 job done", flush=True)
