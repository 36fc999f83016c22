"""Convergence parity: bf16-fused vs f32 training on the real dataset."""
import numpy as np, jax
from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.training.ddpm import train_ddpm

imgs = normalize_pm1(load_synthetic_images("/root/repo/SyntheticImages500.mat"))
for dt in ("bfloat16", None):
    res = train_ddpm(
        imgs, DiffusionConfig(),
        TrainConfig(epochs=30, batch_size=64, checkpoint_every=0, patience=100,
                    compute_dtype=dt, epochs_per_dispatch=10),
        save_final=None, log=None,
    )
    print(f"dtype={dt}: final loss {res.losses[-1]:.4f}, "
          f"min {min(res.losses):.4f}, wall {res.wall_seconds:.1f}s")
