"""Mask-conditioned generation (inpainting) with an unconditional DDPM.

RePaint-style sampling (Lugmayr et al. 2022, simplified): run the textbook
ancestral reverse process, and after every step project the known region
back onto the forward-process marginal q(x_{t-1} | x0_known) — the unknown
region is synthesized conditioned on the known context purely through the
denoiser's receptive field. ``resample > 1`` adds the paper's time-travel
refinement: each step is re-noised back to t and re-denoised r times,
harmonizing the boundary between known and generated content.

A capability addition over the reference, which can only sample from pure
noise (src/generate_images.jl:231-245); everything here reuses its exact
model families and schedules. The whole trajectory (including the resample
inner loop) is one ``lax.scan`` on device, like every sampler in this
framework.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from igdm_tpu.config import DiffusionConfig
from igdm_tpu.diffusion.processes import ddpm_posterior_step
from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config


def sample_inpaint(
    params,
    model_state,
    key,
    known,
    mask,
    *,
    cfg: DiffusionConfig | None = None,
    resample: int = 1,
    model_kind: str = "unet_small",
    apply_fn=None,
):
    """Inpaint: synthesize the masked-out region of ``known``.

    Args:
      known: (B, H, W, C) images in [-1, 1]; content outside the mask is
        preserved, content under mask==0 is ignored and regenerated.
      mask: broadcastable to ``known``; 1.0 = keep the known pixel,
        0.0 = generate. Soft values blend.
      resample: RePaint time-travel count r; each timestep is denoised,
        re-noised back, and re-denoised r times (r=1 is a single pass).
      apply_fn: optional (params, state, x, ts, train) -> (eps, state)
        override, as in every sampler here.

    Returns (B, H, W, C) images in [-1, 1].
    """
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    betas = jnp.asarray(betas_for_config(cfg), jnp.float32)
    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)
    if apply_fn is None:
        apply_fn = make_apply_fn(model_kind, cfg.embed_dim)
    known = jnp.asarray(known, jnp.float32)
    mask = jnp.broadcast_to(jnp.asarray(mask, jnp.float32), known.shape)
    return _sample_inpaint_impl(
        params, model_state, key, known, mask, betas, alpha_bar,
        num_steps=cfg.num_steps, resample=int(max(1, resample)), apply_fn=apply_fn,
    )


@partial(jax.jit, static_argnames=("num_steps", "resample", "apply_fn"))
def _sample_inpaint_impl(
    params, model_state, key, known, mask, betas, alpha_bar,
    *, num_steps, resample, apply_fn,
):
    B = known.shape[0]
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, known.shape, jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), alpha_bar])  # ab_ext[t], t in 0..T
    t_vals = jnp.arange(num_steps, 0, -1)  # T .. 1

    def denoise_and_project(x, t, kb):
        k_z, k_known = jax.random.split(kb)
        eps_pred, _ = apply_fn(params, model_state, x, jnp.full((B,), t), False)
        z = jax.random.normal(k_z, x.shape, jnp.float32)
        z = jnp.where(t > 1, z, jnp.zeros_like(z))
        x_un = ddpm_posterior_step(
            x, eps_pred, z, betas[t - 1], ab_ext[t], ab_ext[t - 1]
        )
        # project the known region onto q(x_{t-1} | x0_known); at t-1 == 0
        # ab_ext[0] == 1 so this is the clean known content
        eps_k = jax.random.normal(k_known, x.shape, jnp.float32)
        ab_prev = ab_ext[t - 1]
        x_kn = jnp.sqrt(ab_prev) * known + jnp.sqrt(1.0 - ab_prev) * eps_k
        return mask * x_kn + (1.0 - mask) * x_un

    def body(x, inputs):
        t, i = inputs
        kb = jax.random.fold_in(k_loop, i)

        def one_pass(r, x):
            kr = jax.random.fold_in(kb, r)
            k_step, k_renoise = jax.random.split(kr)
            x = denoise_and_project(x, t, k_step)
            if resample > 1:
                # time travel: re-noise x_{t-1} -> x_t with the one-step
                # kernel q(x_t | x_{t-1}) except after the final pass
                z = jax.random.normal(k_renoise, x.shape, jnp.float32)
                x_re = jnp.sqrt(1.0 - betas[t - 1]) * x + jnp.sqrt(betas[t - 1]) * z
                x = jnp.where(r < resample - 1, x_re, x)
            return x

        x = jax.lax.fori_loop(0, resample, one_pass, x)
        return x, None

    x, _ = jax.lax.scan(body, x, (t_vals, jnp.arange(num_steps)))
    return jnp.clip(x, -1.0, 1.0)
