"""Modern DDPM training recipe — the last_desperate_attempt generation, fixed.

Reimplements train_net.jl's recipe TPU-natively: 4-level GroupNorm+SiLU U-Net
(models.unet4), AdamW with weight decay, linear-warmup + plateau + cosine LR
(per-epoch, last_desperate_attempt/src/train_net.jl:57-68), z-score data
normalization with (mu, sigma) saved in every checkpoint (train_net.jl:95-101,
231-233), sigma-schedule forward process x_t = sqrt(1-sigma_t^2) x0 +
sigma_t eps (train_net.jl:157), early stopping on best-1e-8 with patience
(train_net.jl:216-227).

Two reference bugs deliberately FIXED (SURVEY.md section 7.3):
  * sigma-zeroing: the reference multiplies sigma by 0 (train_net.jl:155),
    training the model on clean inputs to predict unrelated noise;
  * the frozen time MLP (shared.jl:84) — see models.unet4.

Like training.ddpm, one epoch = one compiled lax.scan over minibatches.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from igdm_tpu.config import TrainConfig, UNet4Config
from igdm_tpu.data.mat import normalize_zscore
from igdm_tpu.diffusion.schedules import alphas_cumprod, linear_beta_schedule, sigma_from_alpha_bar
from igdm_tpu.models import unet4
from igdm_tpu.training.engine import run_epoch_loop
from igdm_tpu.training.lr_schedules import warmup_cosine_lr
from igdm_tpu.training.train_state import TrainState


@dataclass(frozen=True)
class ModernTrainConfig:
    """Hyperparameters of train_net.jl:26-41 (full, non-DEBUG column)."""

    num_steps: int = 150  # T
    beta_min: float = 1e-4
    beta_max: float = 2e-2
    batch_size: int = 32
    epochs: int = 100
    patience: int = 9
    lr_start: float = 3e-3
    lr_min: float = 1e-6
    weight_decay: float = 1e-7
    warmup_epochs: int = 9
    checkpoint_every: int = 10
    seed: int = 0
    final_sigmoid: bool = True  # reference head; set False for a proper eps head
    base_ch: int = 80  # training config of record (train_net.jl:188)


def sigma_schedule(cfg: ModernTrainConfig) -> np.ndarray:
    return sigma_from_alpha_bar(
        alphas_cumprod(linear_beta_schedule(cfg.num_steps, cfg.beta_min, cfg.beta_max))
    )


def diffusion_loss(params, x0, ts, eps, sigmas, *, final_sigmoid: bool):
    """MSE(eps_hat, eps) with x_t = sqrt(1-sigma_t^2) x0 + sigma_t eps."""
    st = sigmas[ts - 1].reshape(-1, 1, 1, 1)
    x_t = jnp.sqrt(1.0 - st**2) * x0 + st * eps
    eps_hat = unet4.apply(params, x_t, ts, final_sigmoid=final_sigmoid)
    return jnp.mean(jnp.square(eps_hat - eps))


def build_epoch_fn(tx, cfg: ModernTrainConfig, n_images: int, *, use_scan: bool | None = None) -> Callable:
    """One compiled epoch on the shared engine
    (:func:`igdm_tpu.training.engine.build_scanned_epoch`): the modern
    recipe is just a batch-loss function plus ``per_epoch_lr`` (the
    Flux.adjust! schedule injection) and ``drop_remainder`` (the reference
    consumes exactly N//bs batches per pass, train_net.jl:202)."""
    from igdm_tpu.training.engine import build_scanned_epoch

    sigmas = jnp.asarray(sigma_schedule(cfg), jnp.float32)
    T, B = cfg.num_steps, cfg.batch_size
    loss_fn = partial(diffusion_loss, final_sigmoid=cfg.final_sigmoid)

    def batch_loss(params, model_state, kb, idx, mask, imgs):
        k_t, k_eps = jax.random.split(kb)
        x0 = jnp.take(imgs, idx, axis=0)
        ts = jax.random.randint(k_t, (B,), 1, T + 1)
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        return loss_fn(params, x0, ts, eps, sigmas), model_state

    return build_scanned_epoch(
        tx, n_images, B, batch_loss,
        drop_remainder=True, per_epoch_lr=True, use_scan=use_scan,
    )


def _make_tx(cfg: ModernTrainConfig):
    """AdamW whose lr is injected per-epoch (Flux.adjust! equivalent,
    train_net.jl:200)."""

    def tx_update_wrapper():
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr_start, b1=0.9, b2=0.999, weight_decay=cfg.weight_decay
        )

        class _Tx:
            def init(self, params):
                return base.init(params)

            def update(self, grads, opt_state, params, *, lr):
                opt_state.hyperparams["learning_rate"] = lr
                return base.update(grads, opt_state, params)

        return _Tx()

    return tx_update_wrapper()


@dataclass
class ModernTrainResult:
    state: TrainState
    losses: list = field(default_factory=list)
    lrs: list = field(default_factory=list)
    mu: float = 0.0
    sigma: float = 1.0
    epochs_run: int = 0
    stopped_early: bool = False
    wall_seconds: float = 0.0
    checkpoints: list = field(default_factory=list)
    early_stop_best: float = float("inf")
    early_stop_no_improve: int = 0


def train_modern(
    imgs_raw: np.ndarray,
    cfg: ModernTrainConfig | None = None,
    *,
    out_dir: str = ".",
    log: Callable[[str], None] | None = print,
) -> ModernTrainResult:
    """Full training loop on raw (un-normalized) (N,H,W,C) images."""
    from igdm_tpu.checkpoint.pytree_io import save_checkpoint

    cfg = cfg or ModernTrainConfig()
    imgs, mu, sigma = normalize_zscore(np.asarray(imgs_raw, np.float32))
    n = imgs.shape[0]

    key = jax.random.PRNGKey(cfg.seed)
    kp, kr = jax.random.split(key)
    params = unet4.init(kp, base_ch=cfg.base_ch)
    tx = _make_tx(cfg)
    state = TrainState(
        params=params,
        model_state={},
        opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
        rng=kr,
    )
    epoch_fn = build_epoch_fn(tx, cfg, n)
    imgs_dev = jnp.asarray(imgs)

    result = ModernTrainResult(state=state, mu=mu, sigma=sigma)

    def lr_for(epoch: int) -> float:
        lr = warmup_cosine_lr(
            epoch,
            lr_start=cfg.lr_start,
            lr_min=cfg.lr_min,
            warmup_epochs=cfg.warmup_epochs,
            total_epochs=cfg.epochs,
        )
        result.lrs.append(lr)
        return lr

    def on_block_end(epoch, _blk, st, _best, _no_improve):
        if cfg.checkpoint_every and epoch % cfg.checkpoint_every == 0:
            path = os.path.join(out_dir, f"checkpoint_epoch{epoch}.npz")
            save_checkpoint(
                path, st, epoch=epoch, norm={"mu": mu, "sigma": sigma},
                model="unet4", modern_cfg=cfg,
            )
            result.checkpoints.append(path)

    # engine patience counts strictly-greater; the reference stops at
    # patience >= PATIENCE (train_net.jl:216-227) — shift by one to match
    loop_cfg = TrainConfig(
        epochs=cfg.epochs, patience=cfg.patience - 1, min_delta=1e-8,
    )
    run_epoch_loop(
        state, (imgs_dev,), epoch_fn, epoch_fn, 1, loop_cfg, result,
        log=log, on_block_end=on_block_end, epoch_lr=lr_for,
    )

    final = os.path.join(out_dir, "final_model.npz")
    save_checkpoint(
        final, result.state, epoch=result.epochs_run, norm={"mu": mu, "sigma": sigma},
        model="unet4", modern_cfg=cfg,
    )
    result.checkpoints.append(final)
    return result
