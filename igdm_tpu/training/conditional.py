"""Class-conditional DDPM training with classifier-free label dropout.

The reference has no conditioning anywhere (SURVEY.md section 2: all three
model generations are unconditional conv/dense stacks); this module is a
framework extension pairing with :mod:`igdm_tpu.sampling.guided`.

Same TPU shape as training/ddpm.py: the whole epoch is one jitted
``lax.scan`` over minibatches — per-epoch permutation, label dropout,
q-sample, fwd/bwd, and the optax update fuse into one XLA program. Labels
ride next to the images as a device-resident (N,) int32 array; with
probability ``drop_prob`` a batch entry's label is replaced by the NULL
token (= num_classes) so the same network learns both branches of
classifier-free guidance (Ho & Salimans 2022).
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


def cond_ddpm_loss(
    params, x0, ts, eps, labels, mask, alpha_bar, *, objective="eps",
    compute_dtype=None,
):
    """Masked-mean noise-prediction MSE with class labels (NULL = dropped)."""
    ab = alpha_bar[ts - 1].reshape(-1, 1, 1, 1)
    alpha = jnp.sqrt(ab)
    sigma = jnp.sqrt(1.0 - ab)
    x_t = alpha * x0 + sigma * eps
    pred = unet4.apply(
        params, x_t, ts, final_sigmoid=False, labels=labels,
        compute_dtype=compute_dtype,
    )
    target = eps if objective == "eps" else alpha * eps - sigma * x0
    per_ex = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
    return jnp.sum(per_ex * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def build_cond_epoch_fn(
    tx: optax.GradientTransformation,
    diff_cfg: DiffusionConfig,
    batch_size: int,
    n_images: int,
    num_classes: int,
    *,
    drop_prob: float = 0.1,
    ema_decay: float = 0.0,
    compute_dtype: str | None = None,
    objective: str = "eps",
    epochs_per_dispatch: int = 1,
) -> Callable:
    """Compile one epoch: ``epoch_fn(state, imgs, labels) -> (state, loss)``
    — the scanned-epoch engine specialized with label-dropout conditioning
    (multi-epoch dispatch and RNG derivation identical to training/ddpm.py)."""
    from igdm_tpu.training.engine import build_scanned_epoch

    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(diff_cfg)), jnp.float32)
    T = diff_cfg.num_steps
    cdt = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16") else None

    def batch_loss(params, model_state, kb, idx, mask, imgs, labels):
        k_t, k_eps, k_drop = jax.random.split(kb, 3)
        x0 = jnp.take(imgs, idx, axis=0)
        lab = jnp.take(labels, idx, axis=0)
        drop = jax.random.bernoulli(k_drop, drop_prob, (batch_size,))
        lab = jnp.where(drop, jnp.int32(num_classes), lab)
        ts = jax.random.randint(k_t, (batch_size,), 1, T + 1)
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        loss = cond_ddpm_loss(
            params, x0, ts, eps, lab, mask, alpha_bar,
            objective=objective, compute_dtype=cdt,
        )
        return loss, model_state

    return build_scanned_epoch(
        tx, n_images, batch_size, batch_loss,
        ema_decay=ema_decay, epochs_per_dispatch=epochs_per_dispatch,
        use_scan=True,
    )


def train_conditional_ddpm(
    imgs: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    diff_cfg: DiffusionConfig | None = None,
    train_cfg: TrainConfig | None = None,
    *,
    drop_prob: float = 0.1,
    base_ch: int = 32,
    mid_attn: bool = False,
    levels: int = 4,
    mesh=None,
    out_dir: str = ".",
    save_final: str | None = "conditional_model",
    log: Callable[[str], None] | None = print,
) -> TrainResult:
    """Train a class-conditional unet4 with early stopping.

    Args:
      imgs: (N, H, W, C) float32 in [-1, 1].
      labels: (N,) int class ids in [0, num_classes).
      drop_prob: classifier-free label-dropout probability (0.1 standard).

    The final checkpoint records ``num_classes``/``drop_prob``/``objective``
    in its metadata so :func:`igdm_tpu.sampling.guided.sample_cfg` (and the
    CLI) can reconstruct the guidance setup.
    """
    import os

    from igdm_tpu.checkpoint.pytree_io import save_checkpoint

    diff_cfg = diff_cfg or DiffusionConfig()
    train_cfg = train_cfg or TrainConfig()
    n = imgs.shape[0]
    assert labels.shape == (n,), f"labels shape {labels.shape} != ({n},)"

    key = jax.random.PRNGKey(train_cfg.seed)
    kp, kr = jax.random.split(key)
    params = unet4.init(
        kp, in_channels=imgs.shape[-1], base_ch=base_ch, mid_attn=mid_attn,
        num_classes=num_classes, levels=levels,
    )
    tx = make_optimizer(train_cfg)
    ema = jax.tree_util.tree_map(jnp.array, params) if train_cfg.ema_decay > 0 else None
    state = TrainState(
        params=params, model_state={}, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32), rng=kr, ema_params=ema,
    )
    from igdm_tpu.training.engine import dispatch_k, run_epoch_loop

    k = dispatch_k(train_cfg)
    kw = dict(
        drop_prob=drop_prob, ema_decay=train_cfg.ema_decay,
        compute_dtype=train_cfg.compute_dtype, objective=train_cfg.objective,
    )
    epoch_fn = build_cond_epoch_fn(
        tx, diff_cfg, train_cfg.batch_size, n, num_classes,
        epochs_per_dispatch=k, **kw,
    )
    epoch_fn_single = (
        epoch_fn if k == 1
        else build_cond_epoch_fn(tx, diff_cfg, train_cfg.batch_size, n, num_classes, **kw)
    )
    imgs_dev = jnp.asarray(imgs, jnp.float32)
    labels_dev = jnp.asarray(labels, jnp.int32)
    if mesh is not None:  # data parallelism, same recipe as train_ddpm
        from igdm_tpu.parallel.sharding import replicate_tree, shard_batch

        imgs_dev = shard_batch(mesh, imgs_dev)
        labels_dev = shard_batch(mesh, labels_dev)
        state = state.replace(
            params=replicate_tree(mesh, state.params),
            opt_state=replicate_tree(mesh, state.opt_state),
            ema_params=None if state.ema_params is None
            else replicate_tree(mesh, state.ema_params),
        )

    result = run_epoch_loop(
        state, (imgs_dev, labels_dev), epoch_fn, epoch_fn_single, k, train_cfg,
        TrainResult(state=state), log=log,
    )

    if save_final:
        path = os.path.join(out_dir, f"{save_final}.npz")
        save_checkpoint(
            path, result.state, diff_cfg=diff_cfg, train_cfg=train_cfg,
            epoch=result.epochs_run, model="unet4",
            data={
                "channels": int(imgs.shape[-1]),
                "image_size": [int(imgs.shape[1]), int(imgs.shape[2])],
                "mid_attn": mid_attn, "base_ch": base_ch,
            },
            conditional={"num_classes": int(num_classes), "drop_prob": float(drop_prob)},
            losses=result.losses,
        )
        result.checkpoints.append(path)
    return result
