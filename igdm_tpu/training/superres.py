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

import time
from functools import partial
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
    ``imgs_hr``. Multi-epoch dispatch as in training/ddpm.py."""
    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(diff_cfg)), jnp.float32)
    n_batches = -(-n_images // batch_size)
    T = diff_cfg.num_steps
    cdt = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16") else None
    grad_fn = jax.value_and_grad(
        lambda p, *a: sr_loss(p, *a, alpha_bar=alpha_bar, compute_dtype=cdt)
    )

    def one_epoch(state: TrainState, imgs, conds):
        key = jax.random.fold_in(state.rng, state.step)
        perm = jax.random.permutation(key, n_images)

        def body(st, b):
            kb = jax.random.fold_in(key, b + 1)
            k_t, k_eps = jax.random.split(kb)
            pos = b * batch_size + jnp.arange(batch_size)
            idx = perm[pos % n_images]
            mask = (pos < n_images).astype(jnp.float32)
            x0 = jnp.take(imgs, idx, axis=0)
            cond = jnp.take(conds, idx, axis=0)
            ts = jax.random.randint(k_t, (batch_size,), 1, T + 1)
            eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
            loss, grads = grad_fn(st.params, x0, cond, ts, eps, mask)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            new_ema = st.ema_params
            if ema_decay > 0:
                t = st.step.astype(jnp.float32) + 1.0
                d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p, st.ema_params, new_params
                )
            return (
                st.replace(
                    params=new_params, opt_state=new_opt, step=st.step + 1,
                    ema_params=new_ema,
                ),
                loss,
            )

        state, losses = jax.lax.scan(body, state, jnp.arange(n_batches))
        return state, jnp.mean(losses)

    if epochs_per_dispatch > 1:

        @partial(jax.jit, donate_argnums=(0,))
        def multi_epoch_fn(state, imgs, conds):
            def eb(st, _):
                return one_epoch(st, imgs, conds)

            return jax.lax.scan(eb, state, None, length=epochs_per_dispatch)

        return multi_epoch_fn

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state, imgs, conds):
        return one_epoch(state, imgs, conds)

    return epoch_fn


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
    params = unet4.init(kp, in_channels=2 * c, base_ch=base_ch)
    tx = make_optimizer(train_cfg)
    ema = jax.tree_util.tree_map(jnp.array, params) if train_cfg.ema_decay > 0 else None
    state = TrainState(
        params=params, model_state={}, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32), rng=kr, ema_params=ema,
    )

    k = max(1, int(train_cfg.epochs_per_dispatch))
    if jax.default_backend() == "cpu":
        k = 1
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

    result = TrainResult(state=state)
    best, no_improve = float("inf"), 0
    t0 = time.time()
    epoch = 0
    while epoch < train_cfg.epochs and not result.stopped_early:
        if k > 1 and train_cfg.epochs - epoch >= k:
            state, losses_vec = epoch_fn(state, imgs_dev, conds)
            block = [float(x) for x in np.asarray(losses_vec)]
        else:
            state, loss = epoch_fn_single(state, imgs_dev, conds)
            block = [float(loss)]
        result.state = state
        for loss in block:
            epoch += 1
            result.losses.append(loss)
            result.epochs_run = epoch
            if log:
                log(f"Epoch {epoch} | avg loss = {loss:.6f}")
            if loss < best - train_cfg.min_delta:
                best, no_improve = loss, 0
            else:
                no_improve += 1
            if no_improve > train_cfg.patience:
                if log:
                    log(f"Early stopping: no improvement for {train_cfg.patience + 1} epochs")
                result.stopped_early = True
                break
    result.wall_seconds = time.time() - t0

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
