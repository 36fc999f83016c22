"""Forward and reverse diffusion processes as pure, jit-friendly functions.

Every stochastic function takes explicit noise (or a JAX PRNG key) — Julia
``randn`` streams cannot be reproduced in JAX, so parity tests inject noise
explicitly (SURVEY.md section 7.3).

Reference semantics reproduced:
  * ``apply_noise``: the package's *sequential shared-epsilon* loop
    (src/ImageGenerationDiffusionModels.jl:60-73). Because the same epsilon is
    reused every step, the loop collapses to one closed-form affine transform
    x -> a*x + b*eps — computed here so a 500-step host loop becomes a single
    fused multiply-add on the TPU VPU.
  * ``q_sample``: the textbook closed-form forward posterior used by the DDPM
    training script (src/train_brain.jl:230-233).
  * ``reverse_diffusion_step``: the script sampler's x0-prediction update,
    including its non-textbook simplified posterior variance
    (src/generate_images.jl:174-214) — kept for checkpoint parity.
  * ``karras_reverse_step``: last_desperate_attempt/src/sample.jl:157.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from igdm_tpu.diffusion.schedules import reference_noise_schedule


def apply_noise_coeffs(
    num_noise_steps: int = 500, beta_min: float = 1e-4, beta_max: float = 0.02
) -> tuple[float, float]:
    """Closed-form (a, b) such that the reference apply_noise loop equals
    ``a * img + b * eps`` for the shared epsilon.

    Loop: img <- sqrt(1-beta_k) * img + sqrt(beta_k) * eps over all betas
    (src/ImageGenerationDiffusionModels.jl:65-67). Unrolled:
      a = prod_k sqrt(1-beta_k)
      b = sum_j sqrt(beta_j) * prod_{k>j} sqrt(1-beta_k)
    Computed in float64: identical to the sequential loop to ~1e-12.
    """
    betas = reference_noise_schedule(num_noise_steps, beta_min, beta_max)
    s = np.sqrt(1.0 - betas)
    # suffix[j] = prod_{k>j} s_k
    suffix = np.concatenate([np.cumprod(s[::-1])[::-1][1:], [1.0]])
    a = float(np.prod(s))
    b = float(np.sum(np.sqrt(betas) * suffix))
    return a, b


def apply_noise_transform(img, eps, a: float, b: float):
    """The fused forward-noise transform: one VPU multiply-add under jit."""
    return a * img + b * eps


def q_sample(x0, eps, alpha_bar_t):
    """Closed-form q(x_t | x_0): sqrt(ab)*x0 + sqrt(1-ab)*eps.

    ``alpha_bar_t`` may be scalar or per-example (B,) — broadcast over NHWC.
    Reference: src/train_brain.jl:230-233.
    """
    ab = jnp.asarray(alpha_bar_t)
    if ab.ndim == 1:
        ab = ab.reshape(-1, 1, 1, 1)
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps


def reverse_diffusion_step(x_t, eps_pred, noise, alpha_bar_t, alpha_bar_prev, *, use_noise):
    """One ancestral step with the reference sampler's exact algebra.

    pred_x0 = (x_t - sqrt(1-ab_t)*eps_hat) / sqrt(ab_t), clamped to [-1,1];
    x_prev  = sqrt(ab_prev)*pred_x0 + sqrt(1-ab_prev)*noise   (t > 1)
            = pred_x0                                         (t == 1)

    The reference's "posterior_variance = (beta_prev*(1-ab_t))/(1-ab_t)"
    algebraically reduces to beta_prev = 1-ab_prev
    (src/generate_images.jl:202) — implemented in reduced form.
    ``use_noise`` is a traced 0/1 flag so the whole T-step loop stays inside
    one lax.scan with no host branching.
    """
    sigma_t = jnp.sqrt(1.0 - alpha_bar_t)
    pred_x0 = (x_t - sigma_t * eps_pred) / jnp.sqrt(alpha_bar_t)
    pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    x_prev = jnp.sqrt(alpha_bar_prev) * pred_x0 + jnp.sqrt(1.0 - alpha_bar_prev) * noise
    return jnp.where(use_noise, x_prev, pred_x0)


def ddpm_posterior_step(x_t, eps_pred, noise, beta_t, alpha_bar_t, alpha_bar_prev, *, clip_x0=True):
    """Textbook DDPM ancestral step (Ho et al. 2020, eq. 6-7) — the correct
    posterior the reference's sampler approximates away
    (src/generate_images.jl:202 collapses to beta_prev).

    mean = sqrt(ab_prev)*beta_t/(1-ab_t) * x0_hat
         + sqrt(alpha_t)*(1-ab_prev)/(1-ab_t) * x_t
    var  = beta_t * (1-ab_prev)/(1-ab_t)
    """
    alpha_t = 1.0 - beta_t
    pred_x0 = (x_t - jnp.sqrt(1.0 - alpha_bar_t) * eps_pred) / jnp.sqrt(alpha_bar_t)
    if clip_x0:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    coef_x0 = jnp.sqrt(alpha_bar_prev) * beta_t / (1.0 - alpha_bar_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - alpha_bar_prev) / (1.0 - alpha_bar_t)
    mean = coef_x0 * pred_x0 + coef_xt * x_t
    var = beta_t * (1.0 - alpha_bar_prev) / (1.0 - alpha_bar_t)
    return mean + jnp.sqrt(jnp.maximum(var, 0.0)) * noise


def ddim_step(x_t, eps_pred, alpha_bar_t, alpha_bar_prev, *, eta: float = 0.0, noise=None,
              clip_x0: bool = True):
    """Deterministic (eta=0) or stochastic DDIM update — the fast sampler the
    reference lacks; standard DDIM algebra (Song et al. 2020).

    clip_x0=False disables the [-1,1] x0 clamp — required when sampling in
    a latent space whose values are not pixel-ranged (sampling/latent.py)."""
    sqrt_ab_t = jnp.sqrt(alpha_bar_t)
    sqrt_1m_ab_t = jnp.sqrt(1.0 - alpha_bar_t)
    pred_x0 = (x_t - sqrt_1m_ab_t * eps_pred) / sqrt_ab_t
    if clip_x0:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    sigma = eta * jnp.sqrt(
        (1.0 - alpha_bar_prev) / (1.0 - alpha_bar_t)
    ) * jnp.sqrt(1.0 - alpha_bar_t / alpha_bar_prev)
    dir_coeff = jnp.sqrt(jnp.maximum(1.0 - alpha_bar_prev - sigma**2, 0.0))
    x_prev = jnp.sqrt(alpha_bar_prev) * pred_x0 + dir_coeff * eps_pred
    if noise is not None:
        x_prev = x_prev + sigma * noise
    return x_prev


def karras_reverse_step(x, eps_pred, z, sigma_t, *, min_sqrt_alpha: float = 1e-7):
    """x <- (x - sigma_t*eps_hat)/max(sqrt(1-sigma_t^2), 1e-7) + sigma_t*z.

    Reference: last_desperate_attempt/src/sample.jl:141-157.
    """
    sqrt_alpha = jnp.maximum(jnp.sqrt(1.0 - sigma_t**2), min_sqrt_alpha)
    return (x - sigma_t * eps_pred) / sqrt_alpha + sigma_t * z
