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
    """Compile one epoch: ``epoch_fn(state, imgs, labels) -> (state, loss)``.

    With ``epochs_per_dispatch`` > 1 the returned function scans k epochs
    inside ONE jitted call and returns the per-epoch loss vector —
    bit-identical numbers to k sequential calls (per-epoch RNG derives from
    ``state.step``), minus k-1 host round-trips (training/ddpm.py has the
    same mechanism, measured 7.8x on the dev relay)."""
    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(diff_cfg)), jnp.float32)
    n_batches = -(-n_images // batch_size)
    T = diff_cfg.num_steps
    cdt = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16") else None
    loss_fn = partial(cond_ddpm_loss, objective=objective, compute_dtype=cdt)
    grad_fn = jax.value_and_grad(
        lambda p, *a: loss_fn(p, *a, alpha_bar=alpha_bar)
    )

    def one_epoch(state: TrainState, imgs, labels):
        key = jax.random.fold_in(state.rng, state.step)
        perm = jax.random.permutation(key, n_images)

        def body(st, b):
            kb = jax.random.fold_in(key, b + 1)
            k_t, k_eps, k_drop = jax.random.split(kb, 3)
            pos = b * batch_size + jnp.arange(batch_size)
            idx = perm[pos % n_images]
            mask = (pos < n_images).astype(jnp.float32)
            x0 = jnp.take(imgs, idx, axis=0)
            lab = jnp.take(labels, idx, axis=0)
            drop = jax.random.bernoulli(k_drop, drop_prob, (batch_size,))
            lab = jnp.where(drop, jnp.int32(num_classes), lab)
            ts = jax.random.randint(k_t, (batch_size,), 1, T + 1)
            eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
            loss, grads = grad_fn(st.params, x0, ts, eps, lab, mask)
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
        def multi_epoch_fn(state: TrainState, imgs, labels):
            def eb(st, _):
                return one_epoch(st, imgs, labels)

            return jax.lax.scan(eb, state, None, length=epochs_per_dispatch)

        return multi_epoch_fn

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, imgs, labels):
        return one_epoch(state, imgs, labels)

    return epoch_fn


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
        num_classes=num_classes,
    )
    tx = make_optimizer(train_cfg)
    ema = jax.tree_util.tree_map(jnp.array, params) if train_cfg.ema_decay > 0 else None
    state = TrainState(
        params=params, model_state={}, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32), rng=kr, ema_params=ema,
    )
    k = max(1, int(train_cfg.epochs_per_dispatch))
    if jax.default_backend() == "cpu":
        k = 1
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

    result = TrainResult(state=state)
    best, no_improve = float("inf"), 0
    t0 = time.time()
    epoch = 0
    while epoch < train_cfg.epochs and not result.stopped_early:
        if k > 1 and train_cfg.epochs - epoch >= k:
            state, losses_vec = epoch_fn(state, imgs_dev, labels_dev)
            block = [float(x) for x in np.asarray(losses_vec)]
        else:
            state, loss = epoch_fn_single(state, imgs_dev, labels_dev)
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
                "channels": int(imgs.shape[-1]),
                "image_size": [int(imgs.shape[1]), int(imgs.shape[2])],
                "mid_attn": mid_attn, "base_ch": base_ch,
            },
            conditional={"num_classes": int(num_classes), "drop_prob": float(drop_prob)},
            losses=result.losses,
        )
        result.checkpoints.append(path)
    return result
