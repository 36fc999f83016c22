"""Diffusion super-resolution (SR3, Saharia et al. 2021).

The reference generates at a fixed resolution only (32x32 dataset;
src/generate_images.jl:231-245). This module trains an upscaler: the
U-Net denoises the high-res image CONDITIONED on the bicubic-upsampled
low-res input, concatenated on the channel axis — so ``unet4`` is reused
unchanged with ``in_channels = 2C`` and the sampler threads the
conditioning image through every step.

TPU shape follows training/ddpm.py: whole epoch in one jitted
``lax.scan``; the low-res conditioning stack is computed once on device
(average-pool + jax.image.resize) and indexed inside the scan.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config
from igdm_tpu.models import unet4
from igdm_tpu.training.ddpm import TrainResult, make_optimizer
from igdm_tpu.training.train_state import TrainState


def make_lowres(imgs, factor: int = 2):
    """(N,H,W,C) -> average-pooled (N,H/f,W/f,C) low-res images."""
    n, h, w, c = imgs.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    return imgs.reshape(n, h // factor, factor, w // factor, factor, c).mean(
        axis=(2, 4)
    )


def upsample_to(lowres, image_size: tuple):
    """Bicubic upsample of (N,h,w,C) to (N,H,W,C) — the conditioning map."""
    n, _, _, c = lowres.shape
    return jax.image.resize(
        lowres, (n, image_size[0], image_size[1], c), method="cubic"
    )


def sr_loss(params, x0, cond, ts, eps, mask, alpha_bar, *, compute_dtype=None):
    """eps-prediction MSE with the upsampled low-res image as an extra
    input channel (the SR3 conditioning scheme)."""
    ab = alpha_bar[ts - 1].reshape(-1, 1, 1, 1)
    x_t = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps
    pred = unet4.apply(
        params, jnp.concatenate([x_t, cond], axis=-1), ts,
        final_sigmoid=False, compute_dtype=compute_dtype,
    )
    per_ex = jnp.mean(jnp.square(pred - eps), axis=(1, 2, 3))
    return jnp.sum(per_ex * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def build_sr_epoch_fn(
    tx: optax.GradientTransformation,
    diff_cfg: DiffusionConfig,
    batch_size: int,
    n_images: int,
    *,
    ema_decay: float = 0.0,
    compute_dtype: str | None = None,
    epochs_per_dispatch: int = 1,
) -> Callable:
    """Compile ``epoch_fn(state, imgs_hr, conds) -> (state, loss)`` where
    ``conds`` is the precomputed upsampled-low-res stack aligned with
    ``imgs_hr`` — the scanned-epoch engine specialized with the SR3
    concat-conditioned loss (multi-epoch dispatch as in training/ddpm.py)."""
    from igdm_tpu.training.engine import build_scanned_epoch

    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(diff_cfg)), jnp.float32)
    T = diff_cfg.num_steps
    cdt = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16") else None

    def batch_loss(params, model_state, kb, idx, mask, imgs, conds):
        k_t, k_eps = jax.random.split(kb)
        x0 = jnp.take(imgs, idx, axis=0)
        cond = jnp.take(conds, idx, axis=0)
        ts = jax.random.randint(k_t, (batch_size,), 1, T + 1)
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        loss = sr_loss(
            params, x0, cond, ts, eps, mask, alpha_bar, compute_dtype=cdt
        )
        return loss, model_state

    return build_scanned_epoch(
        tx, n_images, batch_size, batch_loss,
        ema_decay=ema_decay, epochs_per_dispatch=epochs_per_dispatch,
        use_scan=True,
    )


def train_superres(
    imgs_hr: np.ndarray,
    factor: int = 2,
    diff_cfg: DiffusionConfig | None = None,
    train_cfg: TrainConfig | None = None,
    *,
    base_ch: int = 32,
    out_dir: str = ".",
    save_final: str | None = "superres_model",
    log: Callable[[str], None] | None = print,
) -> TrainResult:
    """Train an SR3-style x``factor`` upscaler on (N,H,W,C) images in [-1,1].

    Low-res pairs are derived on device by average pooling (the standard
    degradation for SR training when only high-res data exists). The
    checkpoint records ``superres={"factor": ...}`` so
    :func:`igdm_tpu.sampling.superres.sample_superres` can validate inputs.
    """
    import os

    from igdm_tpu.checkpoint.pytree_io import save_checkpoint

    diff_cfg = diff_cfg or DiffusionConfig()
    train_cfg = train_cfg or TrainConfig()
    n, h, w, c = imgs_hr.shape

    key = jax.random.PRNGKey(train_cfg.seed)
    kp, kr = jax.random.split(key)
    params = unet4.init(kp, in_channels=2 * c, base_ch=base_ch, out_channels=c)
    tx = make_optimizer(train_cfg)
    ema = jax.tree_util.tree_map(jnp.array, params) if train_cfg.ema_decay > 0 else None
    state = TrainState(
        params=params, model_state={}, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32), rng=kr, ema_params=ema,
    )

    from igdm_tpu.training.engine import dispatch_k, run_epoch_loop

    k = dispatch_k(train_cfg)
    kw = dict(ema_decay=train_cfg.ema_decay, compute_dtype=train_cfg.compute_dtype)
    epoch_fn = build_sr_epoch_fn(
        tx, diff_cfg, train_cfg.batch_size, n, epochs_per_dispatch=k, **kw
    )
    epoch_fn_single = (
        epoch_fn if k == 1
        else build_sr_epoch_fn(tx, diff_cfg, train_cfg.batch_size, n, **kw)
    )

    imgs_dev = jnp.asarray(imgs_hr, jnp.float32)
    conds = upsample_to(make_lowres(imgs_dev, factor), (h, w))

    result = run_epoch_loop(
        state, (imgs_dev, conds), epoch_fn, epoch_fn_single, k, train_cfg,
        TrainResult(state=state), log=log,
    )

    if save_final:
        path = os.path.join(out_dir, f"{save_final}.npz")
        save_checkpoint(
            path, result.state, diff_cfg=diff_cfg, train_cfg=train_cfg,
            epoch=result.epochs_run, model="unet4",
            data={
                "channels": int(c), "image_size": [int(h), int(w)],
                "mid_attn": False, "base_ch": base_ch,
            },
            superres={"factor": int(factor)},
            losses=result.losses,
        )
        result.checkpoints.append(path)
    return result
