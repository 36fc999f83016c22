"""Numerics tests for schedules and processes — coverage the reference lacks
(SURVEY.md section 4: add sampler-vs-schedule numerical tests)."""

import numpy as np
import jax
import jax.numpy as jnp

from igdm_tpu.diffusion.processes import (
    apply_noise_coeffs,
    apply_noise_transform,
    ddim_step,
    karras_reverse_step,
    q_sample,
    reverse_diffusion_step,
)
from igdm_tpu.diffusion.schedules import (
    alphas_cumprod,
    karras_sigma_schedule,
    linear_beta_schedule,
    reference_noise_schedule,
)


def test_linear_beta_schedule_endpoints():
    b = linear_beta_schedule(500, 1e-4, 0.02)
    assert b.shape == (500,)
    assert np.isclose(b[0], 1e-4) and np.isclose(b[-1], 0.02)
    assert np.all(np.diff(b) > 0)


def test_alphas_cumprod_monotone_decreasing():
    ab = alphas_cumprod(linear_beta_schedule(500))
    assert ab.shape == (500,)
    assert np.all(np.diff(ab) < 0)
    assert 0 < ab[-1] < ab[0] < 1


def test_reference_noise_schedule_has_n_plus_1_betas():
    # Julia's step-range beta_min:(bmax-bmin)/N:beta_max yields N+1 values
    # (src/ImageGenerationDiffusionModels.jl:62)
    b = reference_noise_schedule(500)
    assert b.shape == (501,)
    assert np.isclose(b[0], 1e-4) and np.isclose(b[-1], 0.02)


def test_apply_noise_closed_form_matches_sequential_loop():
    """The fused a*x+b*eps must equal the reference's sequential shared-eps
    loop bit-for-bit (within float64 roundoff)."""
    rng = np.random.default_rng(42)
    img = rng.standard_normal((16, 16))
    eps = rng.standard_normal((16, 16))
    betas = reference_noise_schedule(500)
    x = img.copy()
    for beta in betas:  # the reference loop, verbatim semantics
        x = np.sqrt(1 - beta) * x + np.sqrt(beta) * eps
    a, b = apply_noise_coeffs(500)
    fused = a * img + b * eps
    np.testing.assert_allclose(fused, x, rtol=1e-10, atol=1e-12)


def test_apply_noise_transform_jits():
    a, b = apply_noise_coeffs(500)
    f = jax.jit(lambda x, e: apply_noise_transform(x, e, a, b))
    x = jnp.ones((8, 8))
    e = jnp.zeros((8, 8))
    np.testing.assert_allclose(np.asarray(f(x, e)), a, rtol=1e-6)


def test_q_sample_limits():
    x0 = jnp.ones((2, 4, 4, 1))
    eps = jnp.full((2, 4, 4, 1), 2.0)
    # alpha_bar -> 1: x_t == x0 ; alpha_bar -> 0: x_t == eps
    np.testing.assert_allclose(np.asarray(q_sample(x0, eps, 1.0)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q_sample(x0, eps, 0.0)), 2.0, atol=1e-6)


def test_q_sample_per_example_alpha():
    x0 = jnp.ones((2, 4, 4, 1))
    eps = jnp.zeros((2, 4, 4, 1))
    out = q_sample(x0, eps, jnp.array([1.0, 0.25]))
    np.testing.assert_allclose(np.asarray(out[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 0.5, atol=1e-6)


def test_reverse_diffusion_step_perfect_model_recovers_x0():
    """If eps_pred is the true noise, pred_x0 must equal the original x0."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (2, 8, 8, 1), minval=-0.9, maxval=0.9)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    ab_t = 0.7
    x_t = q_sample(x0, eps, ab_t)
    out = reverse_diffusion_step(
        x_t, eps, jnp.zeros_like(x0), ab_t, 1.0, use_noise=False
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_reverse_diffusion_step_matches_reference_algebra():
    """Check against a literal transcription of src/generate_images.jl:174-211."""
    rng = np.random.default_rng(7)
    x_t = rng.standard_normal((1, 4, 4, 1)).astype(np.float32)
    eps_pred = rng.standard_normal((1, 4, 4, 1)).astype(np.float32)
    noise = rng.standard_normal((1, 4, 4, 1)).astype(np.float32)
    ab_t, ab_prev = 0.5, 0.8

    sigma_t = np.sqrt(1 - ab_t)
    pred_x0 = np.clip((x_t - sigma_t * eps_pred) / np.sqrt(ab_t), -1, 1)
    beta_prev = 1 - ab_prev
    posterior_var = (beta_prev * (1 - ab_t)) / (1 - ab_t)  # == beta_prev
    expected = np.sqrt(ab_prev) * pred_x0 + np.sqrt(posterior_var) * noise

    got = reverse_diffusion_step(x_t, eps_pred, noise, ab_t, ab_prev, use_noise=True)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)


def test_ddim_step_eta0_deterministic_consistency():
    # with ab_prev == ab_t, the deterministic DDIM step is the identity
    rng = np.random.default_rng(3)
    x_t = rng.standard_normal((1, 4, 4, 1)).astype(np.float32) * 0.1
    eps_pred = rng.standard_normal((1, 4, 4, 1)).astype(np.float32) * 0.1
    out = ddim_step(x_t, eps_pred, 0.6, 0.6)
    np.testing.assert_allclose(np.asarray(out), x_t, rtol=1e-4, atol=1e-5)


def test_karras_schedule_matches_reference_quirks():
    # sample.jl:45-57: sigma[0]=0, clamped at 1, truncated to T
    s = karras_sigma_schedule(1e-5, 1.0, 7.0, 750)
    assert s.shape == (750,)
    assert s[0] == 0.0
    assert s.max() <= 1.0
    assert np.all(np.diff(s) >= 0)  # non-decreasing (asserted by ref sample.jl:88)


def test_karras_reverse_step_floor():
    # sqrt(alpha) floored at 1e-7 (sample.jl:144)
    x = jnp.ones((1, 2, 2, 1))
    out = karras_reverse_step(x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.asarray(1.0))
    assert np.isfinite(np.asarray(out)).all()


def test_cosine_beta_schedule():
    from igdm_tpu.diffusion.schedules import alphas_cumprod, cosine_beta_schedule

    b = cosine_beta_schedule(500)
    assert b.shape == (500,)
    assert (b > 0).all() and (b <= 0.999).all()
    ab = alphas_cumprod(b)
    assert np.all(np.diff(ab) < 0)
    assert ab[-1] < 1e-3  # cosine schedule fully noises by T


def test_ddpm_posterior_step_perfect_model_recovers_x0_at_t1():
    from igdm_tpu.diffusion.processes import ddpm_posterior_step

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (2, 8, 8, 1), minval=-0.9, maxval=0.9)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    beta_1, ab_1 = 1e-4, 1.0 - 1e-4
    x_1 = q_sample(x0, eps, ab_1)
    out = ddpm_posterior_step(x_1, eps, jnp.zeros_like(x0), beta_1, ab_1, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_ddpm_posterior_variance_below_reference_variance():
    """The reference's simplified sampler re-noises with var = 1-ab_prev,
    the textbook posterior with beta_t*(1-ab_prev)/(1-ab_t) — strictly less
    noisy at every mid-trajectory step."""
    from igdm_tpu.diffusion.schedules import alphas_cumprod, linear_beta_schedule

    betas = linear_beta_schedule(500)
    ab = alphas_cumprod(betas)
    t = 250
    ref_var = 1 - ab[t - 2]
    textbook_var = betas[t - 1] * (1 - ab[t - 2]) / (1 - ab[t - 1])
    assert textbook_var < ref_var * 0.05
