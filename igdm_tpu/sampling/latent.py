"""Sampling for latent-diffusion checkpoints (training/latent.py).

Latents are not pixel-ranged, so the pixel samplers' [-1, 1] x0 clamp
would destroy them — this module runs the same DDIM / textbook-ancestral
algebra with ``clip_x0=False`` (diffusion/processes), divides out the LDM
scale_factor, and decodes with the VAE in one jitted program. One host
transfer for the whole batch, like every other sampler here (the
reference's only sampler is the T-step host loop,
src/generate_images.jl:231-245).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from igdm_tpu.config import DiffusionConfig
from igdm_tpu.diffusion.processes import ddim_step, ddpm_posterior_step
from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config
from igdm_tpu.models import autoencoder


@partial(
    jax.jit,
    static_argnames=("num_images", "latent_size", "latent_ch", "num_steps",
                     "method", "apply_fn"),
)
def _sample_latents_impl(
    params, model_state, key, betas, alpha_bar, ts, ts_prev, *,
    num_images, latent_size, latent_ch, num_steps, method, apply_fn,
):
    h, w = latent_size
    k0, kl = jax.random.split(key)
    x = jax.random.normal(k0, (num_images, h, w, latent_ch), jnp.float32)

    def body(x, inputs):
        t, tp, i = inputs
        tb = jnp.full((num_images,), t, jnp.int32)
        eps_pred, _ = apply_fn(params, model_state, x, tb, False)
        ab_t = alpha_bar[t - 1]
        ab_prev = jnp.where(tp >= 1, alpha_bar[jnp.maximum(tp - 1, 0)], 1.0)
        if method == "ddim":
            x = ddim_step(x, eps_pred, ab_t, ab_prev, clip_x0=False)
        else:  # textbook ancestral (no noise at the final step)
            noise = jax.random.normal(jax.random.fold_in(kl, i), x.shape, jnp.float32)
            noise = jnp.where(tp >= 1, noise, jnp.zeros_like(noise))
            x = ddpm_posterior_step(
                x, eps_pred, noise, betas[t - 1], ab_t, ab_prev, clip_x0=False
            )
        return x, None

    x, _ = jax.lax.scan(body, x, (ts, ts_prev, jnp.arange(ts.shape[0])))
    return x


def sample_latent(
    ddpm_params,
    ae_params,
    key,
    *,
    cfg: DiffusionConfig | None = None,
    scale: float = 1.0,
    num_images: int = 16,
    latent_size: tuple = (8, 8),
    latent_ch: int = 4,
    method: str = "ddim",  # ddim | ancestral
    num_sample_steps: int = 50,
    model_kind: str = "unet4",
    model_state=None,
    decode: bool = True,
):
    """Sample latents (clip-free), unscale, decode -> (N, H, W, C) images.

    decode=False returns the raw sampled latents (still scaled) — callers
    that own the decode step (sampling/auto's cached decoder) use this."""
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    betas = jnp.asarray(betas_for_config(cfg), jnp.float32)
    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)
    if method == "ancestral":
        ts = np.arange(cfg.num_steps, 0, -1)
    else:
        ts = np.unique(
            np.linspace(1, cfg.num_steps, num_sample_steps).round().astype(np.int64)
        )[::-1]
    ts_prev = np.concatenate([ts[1:], [0]])

    z = _sample_latents_impl(
        ddpm_params, model_state if model_state is not None else {}, key,
        betas, alpha_bar, jnp.asarray(ts.copy()), jnp.asarray(ts_prev.copy()),
        num_images=num_images, latent_size=tuple(latent_size),
        latent_ch=latent_ch, num_steps=cfg.num_steps, method=method,
        apply_fn=make_apply_fn(model_kind, cfg.embed_dim),
    )
    if not decode:
        return z
    return jax.jit(autoencoder.decode)(ae_params, z / scale)
