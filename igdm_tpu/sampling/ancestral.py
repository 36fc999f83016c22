"""Reverse-process samplers, each one compiled ``lax.scan`` on device.

The reference samples with a host-side Julia loop making T separate model
calls (src/generate_images.jl:236-239) — the #1 structural change for TPU:
here the entire trajectory runs inside a single jitted scan, with the RNG
threaded as a key and timestep embeddings computed from the scanned t. One
host<->device transfer per batch of images, total.

Timestep convention matches the reference everywhere: t runs over Julia's
1-based {1..T}; alpha_bar lookups use t-1 into the 0-based table; the
embedding sees the raw t value (src/generate_images.jl:174-214).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from igdm_tpu.config import DiffusionConfig, KarrasConfig
from igdm_tpu.diffusion.processes import ddim_step, karras_reverse_step, reverse_diffusion_step
from igdm_tpu.diffusion.schedules import (
    alphas_cumprod,
    betas_for_config,
    karras_sigma_schedule,
    strided_ddim_grid,
)
from igdm_tpu.models import unet_small, unet4
from igdm_tpu.models.embeddings import timestep_embedding


def _alpha_bar(cfg: DiffusionConfig) -> jnp.ndarray:
    """alpha_bar table honoring cfg.schedule (linear or cosine)."""
    return jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)


@partial(jax.jit, static_argnames=("num_images", "image_size", "num_steps", "embed_dim", "channels"))
def _sample_ddpm_impl(
    params,
    model_state,
    key,
    alpha_bar,
    noises,
    *,
    num_images: int,
    image_size: tuple,
    num_steps: int,
    embed_dim: int,
    channels: int = 1,
):
    h, w = image_size
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, (num_images, h, w, channels), jnp.float32)
    t_vals = jnp.arange(num_steps, 1, -1)  # T, T-1, ..., 2

    def body(x, inputs):
        t, i = inputs
        t_emb = timestep_embedding(jnp.full((num_images,), t, jnp.float32), embed_dim)
        eps_pred, _ = unet_small.apply(params, model_state, x, t_emb, train=False)
        if noises is None:
            noise = jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
        else:
            noise = noises[i]
        # Reference adds noise at every step of its t=T..2 loop (the t==1
        # branch at src/generate_images.jl:205-211 is unreachable).
        x = reverse_diffusion_step(
            x, eps_pred, noise, alpha_bar[t - 1], alpha_bar[t - 2], use_noise=True
        )
        return x, None

    x, _ = jax.lax.scan(body, x, (t_vals, jnp.arange(t_vals.shape[0])))
    return jnp.clip(x, -1.0, 1.0)


def sample_ddpm(
    params,
    model_state,
    key,
    *,
    num_images: int = 1,
    image_size: tuple = (32, 32),
    cfg: DiffusionConfig | None = None,
    x_init=None,
    noises=None,
    channels: int = 1,
):
    """Ancestral sampling with the reference's exact update rule.

    Args:
      key: PRNG key (initial noise + per-step noise derive from it).
      x_init: optional explicit starting noise (B,H,W,1) — for parity tests.
      noises: optional (T-1,B,H,W,1) explicit per-step noises — parity tests.

    Returns (B, H, W, 1) images clipped to [-1, 1].
    """
    cfg = cfg or DiffusionConfig()
    alpha_bar = _alpha_bar(cfg)
    if x_init is not None or noises is not None:
        return _sample_ddpm_explicit(
            params, model_state, key, alpha_bar, x_init, noises,
            num_images=num_images, image_size=tuple(image_size),
            num_steps=cfg.num_steps, embed_dim=cfg.embed_dim, channels=channels,
        )
    return _sample_ddpm_impl(
        params, model_state, key, alpha_bar, None,
        num_images=num_images, image_size=tuple(image_size),
        num_steps=cfg.num_steps, embed_dim=cfg.embed_dim, channels=channels,
    )


@partial(jax.jit, static_argnames=("num_images", "image_size", "num_steps", "embed_dim", "channels"))
def _sample_ddpm_explicit(
    params, model_state, key, alpha_bar, x_init, noises,
    *, num_images, image_size, num_steps, embed_dim, channels=1,
):
    h, w = image_size
    if x_init is None:
        # x_init from the RAW key — the long-standing stream the golden
        # parity fixtures pin; do not re-split here
        x_init = jax.random.normal(key, (num_images, h, w, channels), jnp.float32)
    x = jnp.asarray(x_init, jnp.float32)
    t_vals = jnp.arange(num_steps, 1, -1)
    k_loop = jax.random.split(key)[1]  # only consumed when noises is None

    def body(x, inputs):
        t, i = inputs
        t_emb = timestep_embedding(jnp.full((num_images,), t, jnp.float32), embed_dim)
        eps_pred, _ = unet_small.apply(params, model_state, x, t_emb, train=False)
        if noises is None:
            # explicit x_init but key-derived per-step noise (used to crash
            # on jnp.asarray(None) — round-5 review)
            noise = jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
        else:
            noise = noises[i]
        x = reverse_diffusion_step(
            x, eps_pred, noise, alpha_bar[t - 1], alpha_bar[t - 2], use_noise=True
        )
        return x, None

    x, _ = jax.lax.scan(body, x, (t_vals, jnp.arange(t_vals.shape[0])))
    return jnp.clip(x, -1.0, 1.0)


def sample_ddpm_fast(
    params,
    model_state,
    key,
    *,
    num_images: int = 1,
    image_size: tuple = (32, 32),
    cfg: DiffusionConfig | None = None,
    compute_dtype=jnp.bfloat16,
    channels: int = 1,
):
    """Speed-of-light ancestral sampling: BatchNorm folded into convs and
    (by default) bfloat16 conv compute on the MXU. Same update rule as
    :func:`sample_ddpm`; eps-prediction differs only by bf16 rounding."""
    cfg = cfg or DiffusionConfig()
    folded = unet_small.fold_bn(params, model_state)
    return _sample_fast_impl(
        folded, key, _alpha_bar(cfg),
        num_images=num_images, image_size=tuple(image_size),
        num_steps=cfg.num_steps, embed_dim=cfg.embed_dim,
        compute_dtype=compute_dtype, channels=channels,
    )


@partial(
    jax.jit,
    static_argnames=("num_images", "image_size", "num_steps", "embed_dim", "compute_dtype", "channels"),
)
def _sample_fast_impl(
    folded, key, alpha_bar, *, num_images, image_size, num_steps, embed_dim, compute_dtype,
    channels=1,
):
    h, w = image_size
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, (num_images, h, w, channels), jnp.float32)
    t_vals = jnp.arange(num_steps, 1, -1)

    def body(x, inputs):
        t, i = inputs
        t_emb = timestep_embedding(jnp.full((num_images,), t, jnp.float32), embed_dim)
        eps_pred = unet_small.apply_folded(folded, x, t_emb, compute_dtype=compute_dtype)
        noise = jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
        x = reverse_diffusion_step(
            x, eps_pred, noise, alpha_bar[t - 1], alpha_bar[t - 2], use_noise=True
        )
        return x, None

    x, _ = jax.lax.scan(body, x, (t_vals, jnp.arange(t_vals.shape[0])))
    return jnp.clip(x, -1.0, 1.0)


def make_sampler(
    params,
    model_state,
    *,
    cfg: DiffusionConfig | None = None,
    num_images: int = 256,
    image_size: tuple = (32, 32),
    channels: int = 1,
    compute_dtype=None,
):
    """Compile a serving-style sampler with the weights BAKED IN as XLA
    constants: ``fn(key) -> images``.

    Closing over the params lets XLA constant-fold the eval-mode BatchNorm
    affine into the conv weights and skip per-call parameter transfers —
    measured ~15% faster than the argument-passing path (289 vs 250
    samples/s, batch 256, T=500, v5e). Recompiles per checkpoint — the right
    trade for repeated generation from fixed weights.

    compute_dtype: jnp.bfloat16 runs the U-Net convs at the MXU's bf16 rate
    (2x the f32 conv rate, measured) with the sampler update rule kept in
    f32; None (default) keeps everything f32.
    """
    cfg = cfg or DiffusionConfig()
    alpha_bar = _alpha_bar(cfg)
    h, w = image_size
    T, D, B = cfg.num_steps, cfg.embed_dim, num_images
    folded = unet_small.fold_bn(params, model_state) if compute_dtype is not None else None

    @jax.jit
    def fn(key):
        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, (B, h, w, channels), jnp.float32)
        t_vals = jnp.arange(T, 1, -1)

        def body(x, inputs):
            t, i = inputs
            # t is one scalar for the whole batch: a (1, D) embedding
            # broadcasts through the decomposed time map, so the per-step
            # (B,H,W,64) f32 contribution (a ~54 us/step materialized
            # transpose, BASELINE.md round-3) collapses to (1,H,W,64) —
            # numerically identical rows either way.
            t_emb = timestep_embedding(jnp.full((1,), t, jnp.float32), D)
            if compute_dtype is not None:
                eps_pred = unet_small.apply_folded(
                    folded, x, t_emb, compute_dtype=compute_dtype, decompose_time_conv=True
                )
            else:
                eps_pred, _ = unet_small.apply(
                    params, model_state, x, t_emb, train=False, decompose_time_conv=True
                )
            noise = jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
            return (
                reverse_diffusion_step(
                    x, eps_pred, noise, alpha_bar[t - 1], alpha_bar[t - 2], use_noise=True
                ),
                None,
            )

        x, _ = jax.lax.scan(body, x, (t_vals, jnp.arange(t_vals.shape[0])))
        return jnp.clip(x, -1.0, 1.0)

    return fn


def v_to_eps_apply_fn(apply_fn, alpha_bar):
    """Adapt a v-prediction model (TrainConfig.objective="v") to the
    eps-prediction interface every sampler consumes.

    Variance-preserving identity with alpha=sqrt(ab), sigma=sqrt(1-ab):
    given v = alpha*eps - sigma*x0 and x_t = alpha*x0 + sigma*eps,
    eps = sigma*x_t + alpha*v — exact, no model call added.
    """
    ab_table = jnp.asarray(alpha_bar, jnp.float32)

    def wrapped(params, state, x, ts, train):
        v_hat, new_state = apply_fn(params, state, x, ts, train)
        ab = ab_table[ts - 1].reshape(-1, 1, 1, 1)  # 1-based ts convention
        eps_hat = jnp.sqrt(1.0 - ab) * x + jnp.sqrt(ab) * v_hat
        return eps_hat, new_state

    return wrapped


def make_textbook_sampler(
    params,
    model_state,
    *,
    cfg: DiffusionConfig | None = None,
    num_images: int = 16,
    image_size: tuple = (32, 32),
    channels: int = 1,
    model_kind: str = "unet_small",
    apply_fn=None,
    compute_dtype=None,
):
    """Textbook DDPM ancestral sampler (Ho et al. posterior — see
    diffusion.processes.ddpm_posterior_step), baked weights, full T..1 loop
    with no noise at the final step. The correctness upgrade over the
    reference's simplified sampler; works with either noise-predictor family
    and either beta schedule (DiffusionConfig.schedule).

    compute_dtype: jnp.bfloat16 runs the model's convs at the MXU bf16 rate
    (norm statistics stay f32; the posterior update stays f32) — the
    serving configuration for the unet4 quality flagship."""
    from igdm_tpu.diffusion.processes import ddpm_posterior_step
    from igdm_tpu.diffusion.schedules import betas_for_config
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    betas = jnp.asarray(betas_for_config(cfg), jnp.float32)
    alpha_bar = jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), alpha_bar])  # ab_ext[t], t in 0..T
    if apply_fn is None:
        apply_fn = make_apply_fn(model_kind, cfg.embed_dim, compute_dtype=compute_dtype)
    h, w = image_size
    T, B = cfg.num_steps, num_images

    @jax.jit
    def fn(key):
        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, (B, h, w, channels), jnp.float32)
        t_vals = jnp.arange(T, 0, -1)  # T .. 1

        def body(x, inputs):
            t, i = inputs
            eps_pred, _ = apply_fn(params, model_state, x, jnp.full((B,), t), False)
            z = jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
            z = jnp.where(t > 1, z, jnp.zeros_like(z))  # no noise at the last step
            x = ddpm_posterior_step(
                x, eps_pred, z, betas[t - 1], ab_ext[t], ab_ext[t - 1]
            )
            return x, None

        x, _ = jax.lax.scan(body, x, (t_vals, jnp.arange(T)))
        return jnp.clip(x, -1.0, 1.0)

    return fn


def sample_ddpm_sharded(
    params,
    model_state,
    key,
    mesh,
    *,
    num_images: int,
    image_size: tuple = (32, 32),
    cfg: DiffusionConfig | None = None,
    channels: int = 1,
):
    """Data-parallel batch generation: the sample batch is sharded over the
    mesh's 'data' axis (params replicated); every chip runs its shard of the
    lax.scan trajectory independently — zero collectives in the loop, so
    throughput scales linearly with chips. The TPU-native realization of the
    reference's ``generate_image(num_images=...)`` at scale.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = cfg or DiffusionConfig()
    if num_images % mesh.devices.size:
        raise ValueError(f"num_images={num_images} not divisible by mesh size {mesh.devices.size}")
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    model_state = jax.device_put(model_state, repl)
    key = jax.device_put(key, repl)
    alpha_bar = jax.device_put(_alpha_bar(cfg), repl)

    batch_sh = NamedSharding(mesh, P("data"))
    fn = jax.jit(
        partial(
            _sample_ddpm_impl.__wrapped__,  # un-jitted impl
            num_images=num_images,
            image_size=tuple(image_size),
            num_steps=cfg.num_steps,
            embed_dim=cfg.embed_dim,
            channels=channels,
        ),
        out_shardings=batch_sh,
    )
    return fn(params, model_state, key, alpha_bar, None)


def sample_ddim(
    params,
    model_state,
    key,
    *,
    num_images: int = 1,
    image_size: tuple = (32, 32),
    cfg: DiffusionConfig | None = None,
    num_sample_steps: int = 50,
    eta: float = 0.0,
    channels: int = 1,
    model_kind: str = "unet_small",
    apply_fn=None,
):
    """Fast DDIM sampling over a strided timestep subset — the accelerated
    sampler the reference lacks (BASELINE.json stretch config)."""
    cfg = cfg or DiffusionConfig()
    alpha_bar = _alpha_bar(cfg)
    # strided 1-based timesteps T ... 1, length num_sample_steps
    ts, ts_prev = strided_ddim_grid(cfg.num_steps, num_sample_steps)  # 0 => alpha_bar_prev = 1
    return _sample_ddim_impl(
        params, model_state, key, alpha_bar,
        jnp.asarray(ts.copy()), jnp.asarray(ts_prev.copy()),
        num_images=num_images, image_size=tuple(image_size),
        embed_dim=cfg.embed_dim, eta=eta, channels=channels, model_kind=model_kind,
        apply_fn=apply_fn,
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_images", "image_size", "embed_dim", "eta", "channels", "model_kind", "apply_fn",
    ),
)
def _sample_ddim_impl(
    params, model_state, key, alpha_bar, ts, ts_prev,
    *, num_images, image_size, embed_dim, eta, channels=1, model_kind="unet_small",
    apply_fn=None,
):
    from igdm_tpu.training.ddpm import make_apply_fn

    if apply_fn is None:
        apply_fn = make_apply_fn(model_kind, embed_dim)
    h, w = image_size
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, (num_images, h, w, channels), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), alpha_bar])  # ab_ext[t] for t in 0..T

    def body(x, inputs):
        t, t_prev, i = inputs
        eps_pred, _ = apply_fn(params, model_state, x, jnp.full((num_images,), t), False)
        noise = (
            jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
            if eta > 0
            else None
        )
        x = ddim_step(x, eps_pred, ab_ext[t], ab_ext[t_prev], eta=eta, noise=noise)
        return x, None

    x, _ = jax.lax.scan(body, x, (ts, ts_prev, jnp.arange(ts.shape[0])))
    return jnp.clip(x, -1.0, 1.0)


def sample_karras(
    params,
    key,
    *,
    num_images: int = 16,
    image_size: tuple = (32, 32),
    cfg: KarrasConfig | None = None,
    mu: float = 0.0,
    sigma: float = 1.0,
    final_sigmoid: bool = True,
):
    """Karras-schedule sampler for the 4-level U-Net.

    Reference: last_desperate_attempt/src/sample.jl:120-165 — t runs
    steps..1, fresh z for t>1, x <- (x - sig_t*eps)/sqrt(1-sig_t^2) + sig_t*z,
    then denormalize x*sigma + mu.
    """
    cfg = cfg or KarrasConfig()
    sigmas = jnp.asarray(
        karras_sigma_schedule(cfg.sigma_min, cfg.sigma_max, cfg.rho, cfg.num_steps),
        jnp.float32,
    )
    return _sample_karras_impl(
        params, key, sigmas,
        num_images=num_images, image_size=tuple(image_size),
        num_steps=cfg.num_steps, mu=float(mu), sigma=float(sigma),
        final_sigmoid=final_sigmoid,
    )


def sample_with_sigmas(
    params,
    key,
    sigmas,
    *,
    num_images: int = 16,
    image_size: tuple = (32, 32),
    mu: float = 0.0,
    sigma: float = 1.0,
    final_sigmoid: bool = True,
):
    """Sigma-schedule sampler for the 4-level U-Net with an arbitrary sigma
    array — used to sample with the *training* schedule (fixing the
    reference's train/sample schedule mismatch, SURVEY.md section 5.6)."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    return _sample_karras_impl(
        params, key, sigmas,
        num_images=num_images, image_size=tuple(image_size),
        num_steps=int(sigmas.shape[0]), mu=float(mu), sigma=float(sigma),
        final_sigmoid=final_sigmoid,
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_images", "image_size", "num_steps", "mu", "sigma", "final_sigmoid", "channels",
    ),
)
def _sample_karras_impl(
    params, key, sigmas, *, num_images, image_size, num_steps, mu, sigma, final_sigmoid,
    channels=1,
):
    h, w = image_size
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, (num_images, h, w, channels), jnp.float32)
    t_vals = jnp.arange(num_steps, 0, -1)  # steps .. 1

    def body(x, inputs):
        t, i = inputs
        z = jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
        z = jnp.where(t > 1, z, jnp.zeros_like(z))
        eps_pred = unet4.apply(
            params, x, jnp.full((num_images,), t), final_sigmoid=final_sigmoid
        )
        x = karras_reverse_step(x, eps_pred, z, sigmas[t - 1])
        return x, None

    x, _ = jax.lax.scan(body, x, (t_vals, jnp.arange(num_steps)))
    return x * sigma + mu


def sample_dpmpp2m(
    params,
    model_state,
    key,
    *,
    num_images: int = 16,
    image_size: tuple = (32, 32),
    cfg: DiffusionConfig | None = None,
    num_sample_steps: int = 20,
    channels: int = 1,
    model_kind: str = "unet_small",
    apply_fn=None,
):
    """DPM-Solver++(2M): deterministic second-order multistep sampling in the
    data-prediction parameterization — state-of-the-art few-step sampling
    (10-25 steps where DDIM needs ~50). A capability addition over the
    reference (which has only the T-step ancestral loop,
    src/generate_images.jl:231-245).

    Math (data prediction, 2M): with alpha_t = sqrt(alpha_bar_t),
    sigma_t = sqrt(1 - alpha_bar_t), lambda_t = log(alpha_t / sigma_t),
    h_i = lambda_i - lambda_{i-1}, r_i = h_{i-1} / h_i:

        D_i = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}
        x_i = (sigma_i / sigma_{i-1}) x_{i-1} - alpha_i (e^{-h_i} - 1) D_i

    First and final steps use the first-order update (D = x0), the standard
    "lower_order_final" stabilization.

    apply_fn: optional (params, state, x, ts, train) -> (eps_pred, state)
    override; defaults to the model_kind dispatch used by all samplers.
    """
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    alpha_bar = _alpha_bar(cfg)
    ts, ts_prev = strided_ddim_grid(cfg.num_steps, num_sample_steps)  # 0 => alpha_bar = 1 (clean)
    if apply_fn is None:
        apply_fn = make_apply_fn(model_kind, cfg.embed_dim)
    return _sample_dpmpp2m_impl(
        params, model_state, key, alpha_bar,
        jnp.asarray(ts.copy()), jnp.asarray(ts_prev.copy()),
        num_images=num_images, image_size=tuple(image_size),
        channels=channels, apply_fn=apply_fn,
    )


@partial(
    jax.jit, static_argnames=("num_images", "image_size", "channels", "apply_fn")
)
def _sample_dpmpp2m_impl(
    params, model_state, key, alpha_bar, ts, ts_prev,
    *, num_images, image_size, channels, apply_fn,
):
    h_, w_ = image_size
    x = jax.random.normal(key, (num_images, h_, w_, channels), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), alpha_bar])  # ab_ext[t], t in 0..T

    def lam_sig_alpha(t):
        ab = ab_ext[t]
        alpha = jnp.sqrt(ab)
        sigma = jnp.sqrt(jnp.maximum(1.0 - ab, 1e-12))  # sigma=0 at t=0 -> clip
        return jnp.log(alpha / sigma), sigma, alpha

    n = ts.shape[0]

    def body(carry, inputs):
        x, x0_prev, h_prev, have_prev = carry
        t, t_prev, i = inputs
        eps_pred, _ = apply_fn(params, model_state, x, jnp.full((num_images,), t), False)
        lam_s, sig_s, alpha_s = lam_sig_alpha(t)
        lam_t, sig_t, alpha_t = lam_sig_alpha(t_prev)
        # clamp the x0-prediction to the data range — the same stabilization
        # ddim_step applies (diffusion/processes.py). At extreme t (cosine
        # alpha_bar_T ~ 1e-8) the 1/alpha_s amplification otherwise turns eps
        # error into O(10^3) x0 error, which a deterministic multistep solver
        # propagates; measured: unclamped -> noise output on a real model.
        x0 = jnp.clip((x - sig_s * eps_pred) / alpha_s, -1.0, 1.0)
        h = lam_t - lam_s
        # 2M correction except on the first step and the final step
        r = h_prev / h
        use_2m = have_prev & (i < n - 1)
        c = jnp.where(use_2m, 1.0 / (2.0 * jnp.maximum(r, 1e-12)), 0.0)
        D = (1.0 + c) * x0 - c * x0_prev
        x = (sig_t / sig_s) * x - alpha_t * jnp.expm1(-h) * D
        return (x, x0, h, jnp.asarray(True)), None

    init = (x, jnp.zeros_like(x), jnp.asarray(1.0, jnp.float32), jnp.asarray(False))
    (x, _, _, _), _ = jax.lax.scan(body, init, (ts, ts_prev, jnp.arange(n)))
    return jnp.clip(x, -1.0, 1.0)


def sample_heun(
    params,
    model_state,
    key,
    *,
    num_images: int = 16,
    image_size: tuple = (32, 32),
    cfg: DiffusionConfig | None = None,
    num_sample_steps: int = 20,
    channels: int = 1,
    model_kind: str = "unet_small",
    apply_fn=None,
):
    """EDM-style Heun sampler (Karras et al. 2022, alg. 1): deterministic
    second-order single-step integration of the probability-flow ODE.

    The VP state is mapped to the EDM parameterization (x_edm = x/alpha_t,
    sigma_edm = sigma_t/alpha_t), where the ODE is dx/dsigma =
    (x - x0_pred)/sigma; each step takes an Euler predictor then averages
    the slopes at both endpoints (trapezoidal corrector) — 2 model calls
    per step except the final sigma=0 step. Complements DPM-Solver++(2M)
    (multistep) with the standard single-step second-order method; a
    capability addition over the reference's T-step ancestral loop
    (src/generate_images.jl:231-245).
    """
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    alpha_bar = _alpha_bar(cfg)
    ts, ts_next = strided_ddim_grid(cfg.num_steps, num_sample_steps)  # 0 => sigma_edm = 0 (clean)
    if apply_fn is None:
        apply_fn = make_apply_fn(model_kind, cfg.embed_dim)
    return _sample_heun_impl(
        params, model_state, key, alpha_bar,
        jnp.asarray(ts.copy()), jnp.asarray(ts_next.copy()),
        num_images=num_images, image_size=tuple(image_size),
        channels=channels, apply_fn=apply_fn,
    )


@partial(
    jax.jit, static_argnames=("num_images", "image_size", "channels", "apply_fn")
)
def _sample_heun_impl(
    params, model_state, key, alpha_bar, ts, ts_next,
    *, num_images, image_size, channels, apply_fn,
):
    h_, w_ = image_size
    x = jax.random.normal(key, (num_images, h_, w_, channels), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), alpha_bar])

    def coeffs(t):
        ab = ab_ext[t]
        alpha = jnp.sqrt(ab)
        sig_edm = jnp.sqrt(jnp.maximum(1.0 - ab, 0.0)) / alpha
        return alpha, sig_edm

    def x0_of(x_vp, t):
        ab = ab_ext[t]
        eps_pred, _ = apply_fn(params, model_state, x_vp, jnp.full((num_images,), t), False)
        x0 = (x_vp - jnp.sqrt(jnp.maximum(1.0 - ab, 0.0)) * eps_pred) / jnp.sqrt(ab)
        return jnp.clip(x0, -1.0, 1.0)

    # carry the EDM-space state so each step is a pure ODE update
    alpha_T, _ = coeffs(ts[0])
    xe = x / alpha_T

    def body(xe, inputs):
        t, t_next = inputs
        alpha_t, sig_t = coeffs(t)
        alpha_n, sig_n = coeffs(t_next)
        d = (xe - x0_of(xe * alpha_t, t)) / jnp.maximum(sig_t, 1e-12)
        xe_euler = xe + (sig_n - sig_t) * d
        # trapezoidal correction unless the endpoint is sigma=0 (t_next==0)
        def corrected(_):
            d2 = (xe_euler - x0_of(xe_euler * alpha_n, t_next)) / jnp.maximum(sig_n, 1e-12)
            return xe + (sig_n - sig_t) * 0.5 * (d + d2)

        xe_next = jax.lax.cond(t_next > 0, corrected, lambda _: xe_euler, None)
        return xe_next, None

    xe, _ = jax.lax.scan(body, xe, (ts, ts_next))
    return jnp.clip(xe, -1.0, 1.0)  # final alpha = 1 at t=0


def calibrate_distilled_int8(
    params,
    grid,
    key,
    *,
    cfg: DiffusionConfig | None = None,
    num_images: int = 256,
    image_size: tuple = (32, 32),
    channels: int = 1,
    model_state=None,
    n_keys: int = 2,
    headroom: float = 1.05,
):
    """Per-conv activation scales for the int8 distilled-student path
    (unet4 only): replays the student's ACTUAL deterministic DDIM
    recursion eagerly (len(grid)-1 steps), recording each conv input's
    abs-max across ``n_keys`` noise draws — the distilled counterpart of
    :func:`igdm_tpu.sampling.flow.calibrate_flow_int8`."""
    from igdm_tpu.models import unet4

    cfg = cfg or DiffusionConfig()
    g = np.asarray(grid)
    alpha_bar = _alpha_bar(cfg)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), alpha_bar])
    mstate = model_state if model_state is not None else {}
    H, W = image_size
    amax: dict = {}
    rec = unet4.recording_apply(amax)
    apply_fn = v_to_eps_apply_fn(
        lambda p, ms, x_t, tvec, train: (rec(p, x_t, tvec, final_sigmoid=False), ms),
        alpha_bar,
    )
    for i in range(n_keys):
        x = jax.random.normal(
            jax.random.fold_in(key, i), (num_images, H, W, channels), jnp.float32
        )
        for t, t_prev in zip(g[1:][::-1].astype(int), g[:-1][::-1].astype(int)):
            eps, _ = apply_fn(
                params, mstate, x, jnp.full((num_images,), t, jnp.int32), False
            )
            x = ddim_step(x, eps, ab_ext[t], ab_ext[t_prev], eta=0.0, noise=None)
    from igdm_tpu.ops.quant import finalize_scales

    return finalize_scales(amax, headroom=headroom)


def make_distilled_sampler(
    params,
    grid,
    *,
    cfg: DiffusionConfig | None = None,
    num_images: int = 256,
    image_size: tuple = (32, 32),
    channels: int = 1,
    model_kind: str = "unet4",
    model_state=None,
    compute_dtype=None,
    act_scales=None,
):
    """Compile a serving-style sampler for a progressively-distilled student
    (training/distill.distill_ddpm): weights baked in as XLA constants,
    ``fn(key) -> images`` in ``len(grid)-1`` deterministic model calls.

    The distilled serving path is the production low-latency configuration:
    an 8-step student replaces the reference's T-step host loop
    (src/generate_images.jl:231-245) with 8 fused device steps.
    compute_dtype=jnp.bfloat16 runs the U-Net convs at the MXU bf16 rate
    with the DDIM update rule kept in f32; "int8" (unet4 only) runs them
    on the int8 MXU path with static calibrated activation scales
    (auto-calibrated here unless ``act_scales`` is given — the quality
    gate for each leg lives in BASELINE.md round-5 int8 section).
    """
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    grid = np.asarray(grid)
    ts = jnp.asarray(grid[1:][::-1].copy().astype(np.int32))
    ts_prev = jnp.asarray(grid[:-1][::-1].copy().astype(np.int32))
    alpha_bar = _alpha_bar(cfg)
    if compute_dtype == "int8":
        if model_kind != "unet4":
            raise ValueError("int8 distilled serving supports unet4 only")
        from igdm_tpu.models import unet4 as _unet4

        if act_scales is None:
            act_scales = calibrate_distilled_int8(
                params, grid, jax.random.PRNGKey(0), cfg=cfg,
                num_images=min(num_images, 256), image_size=tuple(image_size),
                channels=channels, model_state=model_state,
            )
        apply_fn = v_to_eps_apply_fn(_unet4.int8_apply_fn(act_scales), alpha_bar)
    else:
        apply_fn = v_to_eps_apply_fn(
            make_apply_fn(model_kind, cfg.embed_dim, compute_dtype=compute_dtype),
            alpha_bar,
        )
    mstate = model_state if model_state is not None else {}

    @jax.jit
    def fn(key):
        return _sample_ddim_impl(
            params, mstate, key, alpha_bar, ts, ts_prev,
            num_images=num_images, image_size=tuple(image_size),
            embed_dim=cfg.embed_dim, eta=0.0, channels=channels,
            model_kind=model_kind, apply_fn=apply_fn,
        )

    return fn


def sample_distilled(
    params,
    grid,
    key,
    *,
    num_images: int = 16,
    image_size: tuple = (32, 32),
    cfg: DiffusionConfig | None = None,
    channels: int = 1,
    model_kind: str = "unet4",
    model_state=None,
):
    """Sample from a progressively-distilled student
    (training/distill.distill_ddpm): deterministic DDIM over the student's
    boundary grid with the v-prediction parameterization. An N=8 or N=4
    grid serves the full-T model's distribution in N model calls."""
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    grid = np.asarray(grid)
    ts = grid[1:][::-1].astype(np.int32)       # N boundaries, descending, > 0
    ts_prev = grid[:-1][::-1].astype(np.int32)  # ends at 0 (alpha_bar_prev = 1)
    alpha_bar = _alpha_bar(cfg)
    apply_fn = v_to_eps_apply_fn(make_apply_fn(model_kind, cfg.embed_dim), alpha_bar)
    return _sample_ddim_impl(
        params, model_state if model_state is not None else {}, key, alpha_bar,
        jnp.asarray(ts.copy()), jnp.asarray(ts_prev.copy()),
        num_images=num_images, image_size=tuple(image_size),
        embed_dim=cfg.embed_dim, eta=0.0, channels=channels, model_kind=model_kind,
        apply_fn=apply_fn,
    )
