"""DDPM training — jitted, scanned, data-parallel.

TPU-first redesign of the reference training loop (src/train_brain.jl:246-304):

* The whole dataset (1.7 MB) lives on device; an **entire epoch** is one
  compiled ``lax.scan`` over minibatches — per-epoch permutation, q-sampling,
  U-Net fwd/bwd, and optax update all fuse into a single XLA program. The host
  only sees one scalar (epoch loss) per epoch.
* Under a ``data`` mesh the batch axis is sharded and params replicated; the
  global means in the loss and BatchNorm statistics compile to ICI
  all-reduces automatically (jit + NamedSharding — no hand-written pmean).
* Early stopping (patience / min_delta) matches src/train_brain.jl:282-292;
  checkpoints every ``checkpoint_every`` epochs plus a final one, each with
  full optimizer state + RNG so resume is real (reference drops the Adam
  moments, SURVEY.md section 5.4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config
from igdm_tpu.models import unet4, unet_small
from igdm_tpu.models.embeddings import timestep_embedding
from igdm_tpu.training.train_state import TrainState


import functools


@functools.lru_cache(maxsize=32)
def make_apply_fn(model_kind: str, embed_dim: int = 128, compute_dtype=None):
    """Adapter giving every noise predictor the same signature:
    (params, model_state, x_t, ts, train) -> (eps_pred, new_model_state).

    compute_dtype: optional jnp.bfloat16 for mixed-precision conv compute
    (f32 master params and norm statistics). Cached so identical arguments
    return the identical function object — samplers pass the result as a
    static jit argument, and a fresh closure per call would retrace."""
    if model_kind == "unet4":

        def apply_fn(params, model_state, x_t, ts, train):
            return (
                unet4.apply(params, x_t, ts, final_sigmoid=False, compute_dtype=compute_dtype),
                model_state,
            )

        return apply_fn

    def apply_fn(params, model_state, x_t, ts, train):
        t_emb = timestep_embedding(ts.astype(jnp.float32), embed_dim)
        return unet_small.apply(
            params, model_state, x_t, t_emb, train=train, decompose_time_conv=True,
            compute_dtype=compute_dtype,
        )

    return apply_fn


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adamw":
        return optax.adamw(cfg.lr, b1=0.9, b2=0.999, weight_decay=cfg.weight_decay)
    return optax.adam(cfg.lr)


def init_train_state(
    key,
    diff_cfg: DiffusionConfig,
    train_cfg: TrainConfig,
    channels: int = 1,
    *,
    mid_attn: bool = False,
    attn_levels: tuple = (),
    model_kind: str = "unet_small",
    base_ch: int = 64,
    levels: int = 4,
):
    kp, kr = jax.random.split(key)
    if model_kind == "unet4":
        params = unet4.init(
            kp, in_channels=channels, base_ch=base_ch, mid_attn=mid_attn,
            attn_levels=attn_levels, levels=levels,
        )
        model_state = {}
    else:
        params, model_state = unet_small.init(
            kp, channels, diff_cfg.embed_dim, mid_attn=mid_attn
        )
    tx = make_optimizer(train_cfg)
    ema = jax.tree_util.tree_map(jnp.array, params) if train_cfg.ema_decay > 0 else None
    return (
        TrainState(
            params=params,
            model_state=model_state,
            opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32),
            rng=kr,
            ema_params=ema,
        ),
        tx,
    )


def ddpm_loss(
    params, model_state, x0, ts, eps, mask, alpha_bar, embed_dim, apply_fn=None,
    objective: str = "eps",
):
    """Masked-mean noise-prediction MSE (src/train_brain.jl:225-241).

    ``ts`` uses the reference's 1-based convention {1..T}: alpha_bar is
    indexed at ts-1 and the embedding sees the raw ts value — matching what
    the reference model saw during training (src/train_brain.jl:227-236).

    objective: "eps" (reference parity) regresses the injected noise;
    "v" regresses v = alpha*eps - sigma*x0 (Salimans & Ho 2022).
    """
    if apply_fn is None:
        apply_fn = make_apply_fn("unet_small", embed_dim)
    ab = alpha_bar[ts - 1].reshape(-1, 1, 1, 1)
    alpha = jnp.sqrt(ab)
    sigma = jnp.sqrt(1.0 - ab)
    x_t = alpha * x0 + sigma * eps
    pred, new_state = apply_fn(params, model_state, x_t, ts, True)
    target = eps if objective == "eps" else alpha * eps - sigma * x0
    per_ex = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
    loss = jnp.sum(per_ex * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return loss, new_state


def build_epoch_fn(
    tx: optax.GradientTransformation,
    diff_cfg: DiffusionConfig,
    batch_size: int,
    n_images: int,
    *,
    use_scan: bool | None = None,
    ema_decay: float = 0.0,
    model_kind: str = "unet_small",
    compute_dtype: str | None = None,
    epochs_per_dispatch: int = 1,
    objective: str = "eps",
) -> Callable:
    """Compile one full epoch of DDPM training (k epochs with
    ``epochs_per_dispatch``) — the scanned-epoch engine
    (:func:`igdm_tpu.training.engine.build_scanned_epoch`) specialized with
    the q-sample + noise-prediction batch loss."""
    from igdm_tpu.training.engine import build_scanned_epoch

    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(diff_cfg)), jnp.float32)
    T = diff_cfg.num_steps
    D = diff_cfg.embed_dim
    cdt = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16") else None
    apply_fn = make_apply_fn(model_kind, D, compute_dtype=cdt)

    def batch_loss(params, model_state, kb, idx, mask, imgs):
        k_t, k_eps = jax.random.split(kb)
        x0 = jnp.take(imgs, idx, axis=0)
        ts = jax.random.randint(k_t, (batch_size,), 1, T + 1)  # 1-based {1..T}
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        return ddpm_loss(
            params, model_state, x0, ts, eps, mask, alpha_bar, D, apply_fn, objective
        )

    return build_scanned_epoch(
        tx, n_images, batch_size, batch_loss,
        ema_decay=ema_decay, epochs_per_dispatch=epochs_per_dispatch,
        use_scan=use_scan,
    )


@dataclass
class TrainResult:
    state: TrainState
    losses: list = field(default_factory=list)
    epochs_run: int = 0
    stopped_early: bool = False
    wall_seconds: float = 0.0
    checkpoints: list = field(default_factory=list)
    # final early-stopping counters, recorded so checkpoints can resume the
    # patience bookkeeping exactly (engine.run_epoch_loop fills them)
    early_stop_best: float = float("inf")
    early_stop_no_improve: int = 0


def train_ddpm(
    imgs: np.ndarray,
    diff_cfg: DiffusionConfig | None = None,
    train_cfg: TrainConfig | None = None,
    *,
    mesh=None,
    out_dir: str = ".",
    checkpoint_prefix: str = "ddpm_epoch",
    save_final: str | None = "trained_model",
    resume_from: str | None = None,
    mid_attn: bool = False,
    attn_levels: tuple = (),
    model_kind: str = "unet_small",
    base_ch: int = 64,
    levels: int = 4,
    log: Callable[[str], None] | None = print,
) -> TrainResult:
    """Full training loop with early stopping and periodic checkpoints.

    Args:
      imgs: (N, H, W, C) float32 images already scaled to [-1, 1].
      mesh: optional jax Mesh; batch is sharded over its 'data' axis.
      resume_from: checkpoint path — restores params, optimizer moments, RNG,
        step, epoch, and early-stopping counters, making the resumed run
        bit-identical to the uninterrupted one (the reference cannot resume
        at all: it never saved optimizer state, SURVEY.md section 5.4).
    """
    from igdm_tpu.checkpoint.pytree_io import load_checkpoint, save_checkpoint

    diff_cfg = diff_cfg or DiffusionConfig()
    train_cfg = train_cfg or TrainConfig()
    n = imgs.shape[0]

    key = jax.random.PRNGKey(train_cfg.seed)
    state, tx = init_train_state(
        key, diff_cfg, train_cfg, channels=imgs.shape[-1], mid_attn=mid_attn,
        attn_levels=attn_levels, model_kind=model_kind, base_ch=base_ch,
        levels=levels,
    )
    data_meta = {
        "channels": int(imgs.shape[-1]),
        "image_size": [int(imgs.shape[1]), int(imgs.shape[2])],
        "mid_attn": mid_attn,
        "attn_levels": [int(l) for l in attn_levels],
        "base_ch": base_ch,
    }

    start_epoch = 0
    resume_best = float("inf")
    resume_no_improve = 0
    resume_losses: list = []
    if resume_from:
        state, meta = load_checkpoint(resume_from, state)
        start_epoch = int(meta.get("epoch") or 0)
        es = meta.get("early_stop") or {}
        resume_best = es.get("best", float("inf"))
        resume_no_improve = int(es.get("no_improve", 0))
        resume_losses = list(meta.get("losses") or [])
        if log:
            log(f"Resumed from {resume_from} at epoch {start_epoch} (step {int(state.step)})")

    from igdm_tpu.training.engine import dispatch_k, run_epoch_loop

    k = dispatch_k(train_cfg)
    kw_build = dict(
        ema_decay=train_cfg.ema_decay, model_kind=model_kind,
        compute_dtype=train_cfg.compute_dtype, objective=train_cfg.objective,
    )
    epoch_fn = build_epoch_fn(
        tx, diff_cfg, train_cfg.batch_size, n, epochs_per_dispatch=k, **kw_build
    )
    epoch_fn_single = (
        epoch_fn if k == 1
        else build_epoch_fn(tx, diff_cfg, train_cfg.batch_size, n, **kw_build)
    )

    imgs_dev = jnp.asarray(imgs, jnp.float32)
    if mesh is not None:
        from igdm_tpu.parallel.sharding import replicate_tree, shard_batch

        imgs_dev = shard_batch(mesh, imgs_dev)
        state = state.replace(
            params=replicate_tree(mesh, state.params),
            model_state=replicate_tree(mesh, state.model_state),
            opt_state=replicate_tree(mesh, state.opt_state),
        )

    result = TrainResult(state=state)
    result.losses = resume_losses

    def on_block_end(epoch, block_len, st, best, no_improve):
        every = train_cfg.checkpoint_every
        if every and (epoch // every > (epoch - block_len) // every):
            path = os.path.join(out_dir, f"{checkpoint_prefix}_{epoch}.npz")
            save_checkpoint(
                path, st, diff_cfg=diff_cfg, train_cfg=train_cfg, epoch=epoch,
                model=model_kind, data=data_meta,
                early_stop={"best": best, "no_improve": no_improve},
                losses=result.losses,
            )
            result.checkpoints.append(path)

    run_epoch_loop(
        state, (imgs_dev,), epoch_fn, epoch_fn_single, k, train_cfg, result,
        log=log, start_epoch=start_epoch, best=resume_best,
        no_improve=resume_no_improve, on_block_end=on_block_end,
    )

    if save_final:
        path = os.path.join(out_dir, f"{save_final}.npz")
        save_checkpoint(
            path, result.state, diff_cfg=diff_cfg, train_cfg=train_cfg,
            epoch=result.epochs_run, model=model_kind, data=data_meta,
            early_stop={
                "best": result.early_stop_best,
                "no_improve": result.early_stop_no_improve,
            },
            losses=result.losses,
        )
        result.checkpoints.append(path)
    return result
