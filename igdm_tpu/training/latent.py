"""Latent diffusion (Rombach et al. 2022) — diffusion in a learned
compressed space.

The pipeline: (1) train the conv VAE (models/autoencoder.py) on the
pixel data; (2) encode the dataset to latent means, rescale to unit
variance (`scale = 1/std`, the LDM scale_factor); (3) train a standard
eps-prediction DDPM on the scaled latents with the SAME trainer every
pixel model uses (training/ddpm.train_ddpm — the latent tensor is just a
smaller "image": (N, H/4, W/4, latent_ch)); (4) sample latents with a
clip-free sampler and decode (sampling/latent.py).

Why on TPU: a 4x spatial compression cuts per-denoise-step conv work
~16x, so the T-step sampling loop — the serving cost — runs at a small
fraction of the pixel model's time, and the one-shot decoder amortizes
over the whole batch. The reference has nothing latent-space
(SURVEY.md section 2); this is a capability addition.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.models import autoencoder
from igdm_tpu.training.train_state import TrainState


def train_autoencoder(
    imgs: np.ndarray,
    *,
    epochs: int = 200,
    batch_size: int = 64,
    lr: float = 1e-3,
    kl_weight: float = 1e-4,
    base_ch: int = 32,
    latent_ch: int = 4,
    depth: int = 2,
    seed: int = 0,
    out_path: str | None = "ae_model.npz",
    log: Callable[[str], None] | None = print,
):
    """Train the VAE on (N, H, W, C) images in [-1, 1]; rides the shared
    scanned-epoch engine. Returns (params, losses, scale) where scale is
    the LDM scale_factor 1/std over the dataset's latent means."""
    from igdm_tpu.checkpoint.pytree_io import save_checkpoint
    from igdm_tpu.training.engine import build_scanned_epoch, run_epoch_loop
    from igdm_tpu.training.ddpm import TrainResult

    imgs = jnp.asarray(imgs, jnp.float32)
    n = imgs.shape[0]
    key = jax.random.PRNGKey(seed)
    kp, kr = jax.random.split(key)
    params = autoencoder.init(
        kp, in_channels=imgs.shape[-1], base_ch=base_ch, latent_ch=latent_ch,
        depth=depth,
    )
    tx = optax.adam(lr)
    state = TrainState(
        params=params, model_state={}, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32), rng=kr,
    )

    def batch_loss(p, model_state, kb, idx, mask, data):
        x = jnp.take(data, idx, axis=0)
        loss, _ = autoencoder.vae_loss(p, x, kb, kl_weight=kl_weight)
        return loss, model_state

    epoch_fn = build_scanned_epoch(tx, n, batch_size, batch_loss)
    result = TrainResult(state=state)
    loop_cfg = TrainConfig(epochs=epochs, patience=10**9, min_delta=0.0)
    run_epoch_loop(state, (imgs,), epoch_fn, epoch_fn, 1, loop_cfg, result, log=log)

    final = result.state.params
    mean, _ = jax.jit(autoencoder.encode)(final, imgs)
    scale = float(1.0 / (jnp.std(mean) + 1e-8))
    if out_path:
        save_checkpoint(
            out_path, result.state,
            ae={"base_ch": base_ch, "latent_ch": latent_ch, "depth": depth,
                "kl_weight": kl_weight, "scale": scale},
        )
        if log:
            log(f"saved autoencoder to {out_path} (scale={scale:.4f})")
    return final, result.losses, scale


def resolve_ae_path(ckpt_path: str, latent_meta: dict) -> str:
    """Resolve a latent checkpoint's autoencoder path: try the stored path
    (absolute or CWD-relative), then the same directory as the checkpoint —
    the committed-artifact layout, which keeps checkpoints portable across
    checkouts."""
    ae_path = str(latent_meta["ae_path"])
    if os.path.isabs(ae_path) and os.path.isfile(ae_path):
        return ae_path
    # relative path: the checkpoint's OWN directory wins over the CWD — a
    # same-named VAE left in the working directory must not silently shadow
    # the one shipped next to the checkpoint (round-4 review finding)
    cand = os.path.join(
        os.path.dirname(os.path.abspath(ckpt_path)), os.path.basename(ae_path)
    )
    if os.path.isfile(cand):
        return cand
    if os.path.isfile(ae_path):
        return ae_path
    ae_abs = str(latent_meta.get("ae_path_abs", ""))
    if ae_abs and os.path.isfile(ae_abs):
        return ae_abs
    raise FileNotFoundError(
        f"autoencoder checkpoint {ae_path!r} not found (also tried {cand!r}"
        + (f" and {ae_abs!r}" if ae_abs else "") + ")"
    )


def load_autoencoder(path: str):
    """(params, meta['ae']) from a train_autoencoder checkpoint."""
    from igdm_tpu.checkpoint.pytree_io import load_for_sampling

    params, _, meta = load_for_sampling(path)
    return jax.tree_util.tree_map(jnp.asarray, params), meta.get("ae", {})


def _encode_dataset(ae_path: str, imgs):
    """(VAE-encode the pixel dataset with its stored scale) -> scaled
    latents (np.float32), scale — the shared first step of every latent
    trainer."""
    ae_params, ae_meta = load_autoencoder(ae_path)
    scale = float(ae_meta.get("scale", 1.0))
    mean, _ = jax.jit(autoencoder.encode)(ae_params, jnp.asarray(imgs, jnp.float32))
    return np.asarray(mean * scale, np.float32), scale


def _latent_meta(ae_path: str, imgs, scale: float) -> dict:
    """The ``latent`` checkpoint-metadata block every latent trainer saves
    (basename + absolute fallback — resolve_ae_path's contract)."""
    return {
        "ae_path": os.path.basename(str(ae_path)),
        "ae_path_abs": os.path.abspath(str(ae_path)),
        "scale": float(scale),
        "pixel_size": [int(imgs.shape[1]), int(imgs.shape[2])],
        "pixel_channels": int(imgs.shape[-1]),
    }


def train_latent_ddpm(
    imgs: np.ndarray,
    ae_path: str,
    diff_cfg: DiffusionConfig | None = None,
    train_cfg: TrainConfig | None = None,
    *,
    base_ch: int = 64,
    levels: int = 2,
    sample_posterior: bool = False,
    mesh=None,
    out_dir: str = ".",
    save_final: str = "latent_model",
    log: Callable[[str], None] | None = print,
):
    """Encode (N, H, W, C) images with the trained VAE and run the standard
    DDPM trainer on the scaled latents; the final checkpoint carries
    ``latent`` metadata (ae_path + scale + pixel shape) so
    sampling.auto dispatches the decode automatically."""
    from igdm_tpu.checkpoint.pytree_io import save_checkpoint
    from igdm_tpu.training.ddpm import train_ddpm

    diff_cfg = diff_cfg or DiffusionConfig()
    train_cfg = train_cfg or TrainConfig()
    imgs = jnp.asarray(imgs, jnp.float32)
    if sample_posterior:
        # one posterior draw per image: light noise augmentation in latent
        # space (between deterministic means and LDM's fresh-z-per-step)
        ae_params, ae_meta = load_autoencoder(ae_path)
        scale = float(ae_meta.get("scale", 1.0))
        mean, logvar = jax.jit(autoencoder.encode)(ae_params, imgs)
        eps = jax.random.normal(jax.random.PRNGKey(0), mean.shape, jnp.float32)
        latents = np.asarray((mean + jnp.exp(0.5 * logvar) * eps) * scale, np.float32)
    else:
        latents, scale = _encode_dataset(ae_path, imgs)
    if log:
        log(
            f"latents: {latents.shape}, std={latents.std():.3f} "
            f"(scale={scale:.4f})"
        )

    # periodic checkpoints from the inner trainer would lack the ``latent``
    # metadata and be mis-dispatched as pixel models — only the final,
    # fully-annotated checkpoint below is written
    import dataclasses

    train_cfg = dataclasses.replace(train_cfg, checkpoint_every=0)
    res = train_ddpm(
        latents, diff_cfg, train_cfg, model_kind="unet4", base_ch=base_ch,
        levels=levels, mesh=mesh, out_dir=out_dir, save_final=None, log=log,
    )
    path = os.path.join(out_dir, f"{save_final}.npz")
    save_checkpoint(
        path, res.state, epoch=res.epochs_run,
        diff_cfg=diff_cfg, train_cfg=train_cfg, model="unet4",
        data={
            "channels": int(latents.shape[-1]),
            "image_size": [int(latents.shape[1]), int(latents.shape[2])],
        },
        latent=_latent_meta(ae_path, imgs, scale),
    )
    res.checkpoints.append(path)
    if log:
        log(f"saved latent DDPM to {path}")
    return res, path


def train_latent_conditional(
    imgs: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    ae_path: str,
    diff_cfg: DiffusionConfig | None = None,
    train_cfg: TrainConfig | None = None,
    *,
    drop_prob: float = 0.1,
    base_ch: int = 64,
    levels: int = 2,
    mesh=None,
    out_dir: str = ".",
    save_final: str = "latent_cond_model",
    log: Callable[[str], None] | None = print,
):
    """Class-conditional latent diffusion (the Stable-Diffusion shape at
    this dataset's scale): encode with the VAE, train the classifier-free
    conditional DDPM on the scaled latents, keep BOTH ``latent`` and
    ``conditional`` metadata so the dispatcher runs guided CFG sampling in
    latent space (clip-free) and decodes."""
    import dataclasses

    from igdm_tpu.checkpoint.pytree_io import save_checkpoint
    from igdm_tpu.training.conditional import train_conditional_ddpm

    diff_cfg = diff_cfg or DiffusionConfig()
    train_cfg = train_cfg or TrainConfig()
    imgs = jnp.asarray(imgs, jnp.float32)
    latents, scale = _encode_dataset(ae_path, imgs)

    train_cfg = dataclasses.replace(train_cfg, checkpoint_every=0)
    res = train_conditional_ddpm(
        latents, np.asarray(labels), num_classes, diff_cfg, train_cfg,
        drop_prob=drop_prob, base_ch=base_ch, levels=levels, mesh=mesh,
        out_dir=out_dir, save_final=None, log=log,
    )
    path = os.path.join(out_dir, f"{save_final}.npz")
    save_checkpoint(
        path, res.state, epoch=res.epochs_run,
        diff_cfg=diff_cfg, train_cfg=train_cfg, model="unet4",
        data={
            "channels": int(latents.shape[-1]),
            "image_size": [int(latents.shape[1]), int(latents.shape[2])],
        },
        conditional={"num_classes": int(num_classes), "drop_prob": float(drop_prob)},
        latent=_latent_meta(ae_path, imgs, scale),
    )
    res.checkpoints.append(path)
    if log:
        log(f"saved conditional latent DDPM to {path}")
    return res, path


def train_latent_flow(
    imgs: np.ndarray,
    ae_path: str,
    train_cfg: TrainConfig | None = None,
    *,
    base_ch: int = 64,
    levels: int = 2,
    mid_attn: bool = False,
    mesh=None,
    out_dir: str = ".",
    save_final: str = "latent_flow_model",
    log: Callable[[str], None] | None = print,
):
    """Rectified flow in latent space: encode with the VAE, train the
    velocity field on the scaled latents, keep ``flow`` + ``latent``
    metadata so the dispatcher integrates the ODE in latent space and
    decodes. Reflow the result with ``training.flow.train_reflow`` (the
    latent metadata rides through) for 1-call latent serving."""
    from igdm_tpu.checkpoint.pytree_io import save_checkpoint
    from igdm_tpu.training.flow import TIME_SCALE, train_flow

    train_cfg = train_cfg or TrainConfig()
    imgs = jnp.asarray(imgs, jnp.float32)
    latents, scale = _encode_dataset(ae_path, imgs)

    res = train_flow(
        latents, train_cfg, base_ch=base_ch, levels=levels, mid_attn=mid_attn,
        mesh=mesh, out_dir=out_dir, save_final=None, log=log,
    )
    path = os.path.join(out_dir, f"{save_final}.npz")
    save_checkpoint(
        path, res.state, epoch=res.epochs_run, train_cfg=train_cfg,
        model="unet4",
        data={
            "channels": int(latents.shape[-1]),
            "image_size": [int(latents.shape[1]), int(latents.shape[2])],
        },
        flow={"time_scale": TIME_SCALE, "path": "linear"},
        latent=_latent_meta(ae_path, imgs, scale),
        losses=res.losses,
    )
    res.checkpoints.append(path)
    if log:
        log(f"saved latent flow to {path}")
    return res, path
