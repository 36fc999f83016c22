"""Sampling for latent-diffusion checkpoints (training/latent.py).

Latents are not pixel-ranged, so the pixel samplers' [-1, 1] x0 clamp
would destroy them — this module runs the same DDIM / textbook-ancestral
algebra with ``clip_x0=False`` (diffusion/processes), divides out the LDM
scale_factor, and decodes with the VAE in one jitted program. One host
transfer for the whole batch, like every other sampler here (the
reference's only sampler is the T-step host loop,
src/generate_images.jl:231-245).

Serving path: :func:`make_latent_sampler` is the latent counterpart of
``sampling.ancestral.make_sampler`` — weights baked in as XLA constants,
bf16 U-Net + decoder conv compute (sampler algebra kept f32), and the VAE
decode FUSED into the same jitted program as the denoising scan, so a
full trajectory + decode is one dispatch and one transfer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from igdm_tpu.config import DiffusionConfig
from igdm_tpu.diffusion.processes import ddim_step, ddpm_posterior_step
from igdm_tpu.diffusion.schedules import (
    alphas_cumprod,
    betas_for_config,
    strided_ddim_grid,
)
from igdm_tpu.models import autoencoder


def _step_grid(cfg: DiffusionConfig, method: str, num_sample_steps: int):
    """(ts, ts_prev) descending int64 arrays for the chosen method: the full
    T..1 grid for ancestral, a rounded-unique DDIM sub-grid for ddim. Any
    other method (e.g. the flow samplers' 'euler') would silently mix a
    sub-grid with the ancestral update — hard-fail instead."""
    if method not in ("ancestral", "ddim"):
        raise ValueError(
            f"latent sampler method must be 'ancestral' or 'ddim', got "
            f"{method!r} (flow checkpoints dispatch through sampling/flow)"
        )
    if method == "ancestral":
        ts = np.arange(cfg.num_steps, 0, -1)
        return ts, np.concatenate([ts[1:], [0]])
    return strided_ddim_grid(cfg.num_steps, num_sample_steps)


def _denoise_step(
    x, t, tp, i, kl, *, params, model_state, betas, alpha_bar, method, apply_fn,
    eta: float = 0.0,
):
    """ONE clip-free reverse step shared by the argument-passing sampler and
    the baked serving sampler — a numerical fix here reaches both (the
    parity test pins their agreement).

    eta: stochastic DDIM (Song et al. 2020) interpolation — 0 is the
    deterministic sampler, 1 recovers ancestral-posterior noise on the
    sub-grid (ddim_step's sigma is exactly the posterior std for adjacent
    steps; pinned by tests). Ignored for method='ancestral'."""
    tb = jnp.full((x.shape[0],), t, jnp.int32)
    eps_pred, _ = apply_fn(params, model_state, x, tb, False)
    ab_t = alpha_bar[t - 1]
    ab_prev = jnp.where(tp >= 1, alpha_bar[jnp.maximum(tp - 1, 0)], 1.0)
    if method == "ddim":
        noise = None
        if eta > 0:
            noise = jax.random.normal(jax.random.fold_in(kl, i), x.shape, jnp.float32)
            noise = jnp.where(tp >= 1, noise, jnp.zeros_like(noise))
        return ddim_step(x, eps_pred, ab_t, ab_prev, eta=eta, noise=noise,
                         clip_x0=False)
    # textbook ancestral (no noise at the final step)
    noise = jax.random.normal(jax.random.fold_in(kl, i), x.shape, jnp.float32)
    noise = jnp.where(tp >= 1, noise, jnp.zeros_like(noise))
    return ddpm_posterior_step(
        x, eps_pred, noise, betas[t - 1], ab_t, ab_prev, clip_x0=False
    )


@partial(
    jax.jit,
    static_argnames=("num_images", "latent_size", "latent_ch", "num_steps",
                     "method", "apply_fn", "eta"),
)
def _sample_latents_impl(
    params, model_state, key, betas, alpha_bar, ts, ts_prev, *,
    num_images, latent_size, latent_ch, num_steps, method, apply_fn,
    eta=0.0,
):
    h, w = latent_size
    k0, kl = jax.random.split(key)
    x = jax.random.normal(k0, (num_images, h, w, latent_ch), jnp.float32)

    def body(x, inputs):
        t, tp, i = inputs
        x = _denoise_step(
            x, t, tp, i, kl, params=params, model_state=model_state,
            betas=betas, alpha_bar=alpha_bar, method=method, apply_fn=apply_fn,
            eta=eta,
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
    scale: float | None = None,
    num_images: int = 16,
    latent_size: tuple = (8, 8),
    latent_ch: int = 4,
    method: str = "ddim",  # ddim | ancestral
    num_sample_steps: int = 50,
    model_kind: str = "unet4",
    model_state=None,
    decode: bool = True,
    compute_dtype=None,
    eta: float = 0.0,
):
    """Sample latents (clip-free), unscale, decode -> (N, H, W, C) images.

    eta: stochastic-DDIM knob (method='ddim' only): 0 = deterministic,
    1 = posterior-matched noise on the sub-grid — the coverage lever for
    few-step latent sampling (BASELINE.md round-5 eta sweep).

    scale: the checkpoint's LDM scale_factor (``meta['latent']['scale']``) —
    REQUIRED when decode=True; a silently wrong default would decode
    mis-scaled latents (round-4 advisor finding).
    decode=False returns the raw sampled latents (still scaled) — callers
    that own the decode step (sampling/auto's cached decoder) use this.
    compute_dtype: jnp.bfloat16 for MXU-rate U-Net + decoder convs (sampler
    algebra stays f32)."""
    from igdm_tpu.training.ddpm import make_apply_fn

    if decode and scale is None:
        raise ValueError(
            "sample_latent(decode=True) requires scale= (the checkpoint's "
            "meta['latent']['scale'] LDM scale_factor); pass decode=False to "
            "get raw scaled latents instead"
        )
    cfg = cfg or DiffusionConfig()
    betas = jnp.asarray(betas_for_config(cfg), jnp.float32)
    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)
    ts, ts_prev = _step_grid(cfg, method, num_sample_steps)

    z = _sample_latents_impl(
        ddpm_params, model_state if model_state is not None else {}, key,
        betas, alpha_bar, jnp.asarray(ts.copy()), jnp.asarray(ts_prev.copy()),
        num_images=num_images, latent_size=tuple(latent_size),
        latent_ch=latent_ch, num_steps=cfg.num_steps, method=method,
        apply_fn=make_apply_fn(model_kind, cfg.embed_dim, compute_dtype=compute_dtype),
        eta=float(eta),
    )
    if not decode:
        return z
    return jax.jit(partial(autoencoder.decode, compute_dtype=compute_dtype))(
        ae_params, z / scale
    )


def make_latent_sampler(
    ddpm_params,
    ae_params,
    *,
    cfg: DiffusionConfig | None = None,
    scale: float,
    num_images: int = 256,
    latent_size: tuple = (8, 8),
    latent_ch: int = 4,
    method: str = "ancestral",  # ancestral | ddim
    num_sample_steps: int = 50,
    model_kind: str = "unet4",
    model_state=None,
    compute_dtype=None,
    decode: bool = True,
    eta: float = 0.0,
):
    """Compile a serving-style latent sampler with the U-Net AND VAE weights
    baked in as XLA constants: ``fn(key) -> images``.

    The latent analogue of ``sampling.ancestral.make_sampler`` (its measured
    wins carry over: constant-folded weights, no per-call parameter
    transfers) plus the decode FUSED into the same program — the whole
    trajectory and the pixel reconstruction are one XLA module, one
    dispatch, one device->host transfer.

    compute_dtype: None (default) keeps everything f32 — at 8x8-latent conv
    shapes bf16 is a measured NEGATIVE for the denoise scan (-6.6% at batch
    256; the tiny convs are layout-bound, not MXU-rate-bound — BASELINE.md
    round-5 latent roofline). jnp.bfloat16 runs denoiser AND decoder convs
    in bf16 (f32 update rule and GroupNorm statistics) — the right setting
    when the decode dominates (few-step sampling at batch >= 1024, where
    the decoder's 32x32 conv runs ~2x at bf16).
    """
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    betas = jnp.asarray(betas_for_config(cfg), jnp.float32)
    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)
    ts_np, tsp_np = _step_grid(cfg, method, num_sample_steps)
    ts = jnp.asarray(ts_np.copy())
    ts_prev = jnp.asarray(tsp_np.copy())
    apply_fn = make_apply_fn(model_kind, cfg.embed_dim, compute_dtype=compute_dtype)
    mstate = model_state if model_state is not None else {}
    B = num_images
    h, w = latent_size
    inv_scale = 1.0 / float(scale)

    @jax.jit
    def fn(key):
        k0, kl = jax.random.split(key)
        x = jax.random.normal(k0, (B, h, w, latent_ch), jnp.float32)

        def body(x, inputs):
            t, tp, i = inputs
            x = _denoise_step(
                x, t, tp, i, kl, params=ddpm_params, model_state=mstate,
                betas=betas, alpha_bar=alpha_bar, method=method,
                apply_fn=apply_fn, eta=float(eta),
            )
            return x, None

        z, _ = jax.lax.scan(body, x, (ts, ts_prev, jnp.arange(ts.shape[0])))
        if not decode:
            return z
        return autoencoder.decode(ae_params, z * inv_scale, compute_dtype=compute_dtype)

    return fn
