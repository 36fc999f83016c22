"""Consistency distillation (Song et al. 2023; improved techniques from
Song & Dhariwal 2023) — 1-2 call sampling for the DDPM families.

The reference serves its trained noise predictors only through the full
T-step host loop (src/generate_images.jl:231-245). This module is the third
few-step family in the framework, complementing progressive distillation
(training/distill.py: log2(T) halving phases, an N-step DDIM student) and
reflow (training/flow.py: flow-family only). Consistency distillation maps
EVERY point of the teacher's probability-flow ODE directly to its endpoint:

    f(x_t, t) = c_skip(t) * (x_t / alpha_t) + c_out(t) * F_theta(x_t, t)

with the boundary condition f(x, t_min) = x enforced exactly by the
parameterization (c_skip(t_min) = 1, c_out(t_min) = 0 — Song et al. eq. 5
with the VP-to-VE change of variables sigma_hat = sigma_t/alpha_t). Training
enforces self-consistency between adjacent points of an N-point sub-grid of
the teacher's schedule: one teacher DDIM step carries x_t to x_s, and the
student must map both to the same endpoint,

    loss = lambda(t) * d( f_theta(x_t, t), stopgrad f_theta(x_s, s) ).

Following the improved-techniques paper the target network is the stopgrad
of the ONLINE network (no target EMA), the metric d is the pseudo-Huber
loss with c = 0.00054 * sqrt(D), and lambda(t) = 1/(sigma_hat_t -
sigma_hat_s). The result samples in ONE model call (x0 = f(x_T, T)), with
an optional multistep refinement that re-noises to intermediate grid points
(sampling/consistency.py).

TPU shape: identical to the other distillation loops — the student update,
the teacher's DDIM step, and the RNG all fuse into one ``lax.scan`` program
per ``steps_per_dispatch`` steps (training/engine.build_step_runner); the
host only sees scalar losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from igdm_tpu.config import DiffusionConfig, config_from_dict
from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config
from igdm_tpu.training.distill import _coeffs, _to_x0_eps

SIGMA_DATA = 0.5  # std of data in [-1, 1] (Karras et al. 2022 convention)


def consistency_grid(T: int, n_grid: int) -> np.ndarray:
    """N+1 strictly-increasing integer boundaries t_min=1 .. t_N=T.

    Song et al. use N ~ 18 sub-grid points during distillation; denser
    grids shrink the per-step ODE error but weaken the training signal
    (adjacent x_t, x_s become nearly identical)."""
    g = np.unique(np.round(np.linspace(1, T, n_grid + 1)).astype(np.int64))
    if len(g) != n_grid + 1:
        raise ValueError(f"T={T} too small for an {n_grid}-interval consistency grid")
    return g


def consistency_scalings(ab_ext, t, sigma_data: float = SIGMA_DATA):
    """(c_skip, c_out, alpha_t) at integer timesteps t (broadcastable).

    sigma_hat = sigma_t/alpha_t is the VE-equivalent noise level of the VP
    marginal; the t_min offset makes the boundary exact at the grid's first
    point (f(x, t_min) = x/alpha_{t_min} ~= x, alpha_{t_min} = 1 - 5e-5
    for the committed schedules)."""
    a, s = _coeffs(ab_ext, t)
    a1, s1 = _coeffs(ab_ext, jnp.asarray(1))
    sig = s / a
    sig_min = s1 / a1
    d = sig - sig_min
    c_skip = sigma_data**2 / (d**2 + sigma_data**2)
    c_out = sigma_data * d / jnp.sqrt(sig**2 + sigma_data**2)
    return c_skip, c_out, a


def consistency_fn(apply_fn, params, model_state, x_t, t, ab_ext,
                   sigma_data: float = SIGMA_DATA):
    """Evaluate f(x_t, t) -> x0 estimate (the consistency function)."""
    c_skip, c_out, a = consistency_scalings(ab_ext, t, sigma_data)
    r = lambda c: c.reshape(-1, 1, 1, 1) if c.ndim == 1 else c
    F, _ = apply_fn(params, model_state, x_t, t, False)
    return r(c_skip) * (x_t / r(a)) + r(c_out) * F


def make_cd_step_fn(
    tx,
    diff_cfg: DiffusionConfig,
    batch_size: int,
    grid,
    teacher_objective: str,
    *,
    model_kind: str = "unet4",
    compute_dtype: str | None = "bfloat16",
    steps_per_dispatch: int = 50,
    model_state=None,
    sigma_data: float = SIGMA_DATA,
):
    """Compile ``steps_per_dispatch`` consistency-distillation steps as one
    ``lax.scan`` (the shared step-runner scaffolding, engine.py)."""
    from igdm_tpu.training.ddpm import make_apply_fn
    from igdm_tpu.training.engine import build_step_runner

    ab = jnp.asarray(alphas_cumprod(betas_for_config(diff_cfg)), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), ab])
    g = jnp.asarray(np.asarray(grid), jnp.int32)  # (N+1,) boundaries 1..T
    N = int(g.shape[0]) - 1
    cdt = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16") else None
    apply_fn = make_apply_fn(model_kind, diff_cfg.embed_dim, compute_dtype=cdt)
    mstate = model_state if model_state is not None else {}

    def loss_fn(params, teacher_params, x0, n_idx, eps):
        # n_idx in {1..N}: consistency pair (t, s) = (g[n], g[n-1])
        t = g[n_idx]
        s = g[n_idx - 1]
        a_t, s_t = (c.reshape(-1, 1, 1, 1) for c in _coeffs(ab_ext, t))
        a_s, s_s = (c.reshape(-1, 1, 1, 1) for c in _coeffs(ab_ext, s))
        x_t = a_t * x0 + s_t * eps

        # teacher: ONE deterministic DDIM step t -> s on the PF-ODE
        pred, _ = apply_fn(teacher_params, mstate, x_t, t, False)
        tx0, teps = _to_x0_eps(pred, x_t, a_t, s_t, teacher_objective)
        x_s = a_s * tx0 + s_s * teps

        f_t = consistency_fn(apply_fn, params, mstate, x_t, t, ab_ext, sigma_data)
        f_s = jax.lax.stop_gradient(
            consistency_fn(apply_fn, params, mstate, x_s, s, ab_ext, sigma_data)
        )
        D = float(np.prod(x0.shape[1:]))
        c_ph = 0.00054 * np.sqrt(D)
        per_ex = jnp.sqrt(
            jnp.sum(jnp.square(f_t - f_s), axis=(1, 2, 3)) + c_ph**2
        ) - c_ph
        # lambda(t) = 1/(sigma_hat_t - sigma_hat_s): balances the gradient
        # scale across noise levels (improved-techniques weighting)
        sig_t = (s_t / a_t).reshape(-1)
        sig_s = (s_s / a_s).reshape(-1)
        w = 1.0 / jnp.maximum(sig_t - sig_s, 1e-8)
        return jnp.mean(w * per_ex)

    return build_step_runner(
        tx, jax.value_and_grad(loss_fn), batch_size, N, steps_per_dispatch
    )


def consistency_distill(
    params,
    imgs,
    *,
    diff_cfg: DiffusionConfig | None = None,
    objective: str = "eps",
    n_grid: int = 18,
    steps: int = 4000,
    batch_size: int = 64,
    lr: float = 1e-4,
    model_kind: str = "unet4",
    compute_dtype: str | None = "bfloat16",
    steps_per_dispatch: int = 50,
    sigma_data: float = SIGMA_DATA,
    key=None,
    log=print,
    model_state=None,
):
    """Distill a trained DDPM into a consistency model.

    Args:
      params: trained noise-predictor params (teacher; the student F starts
        as a copy — the paper's initialization).
      imgs: (M, H, W, C) training images in [-1, 1] (kept on device).
      objective: the teacher's parameterization ("eps" or "v").
      n_grid: sub-grid intervals N for the self-consistency pairs.
      steps: total optimization steps.

    Returns ``(student_params, grid, losses)``; sample with
    :func:`igdm_tpu.sampling.consistency.sample_consistency`.
    """
    diff_cfg = diff_cfg or DiffusionConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    imgs = jnp.asarray(imgs, jnp.float32)
    grid = consistency_grid(diff_cfg.num_steps, n_grid)

    student = jax.tree_util.tree_map(jnp.array, params)
    tx = optax.adam(lr)
    opt_state = tx.init(student)
    run = make_cd_step_fn(
        tx, diff_cfg, batch_size, grid, objective,
        model_kind=model_kind, compute_dtype=compute_dtype,
        steps_per_dispatch=steps_per_dispatch, model_state=model_state,
        sigma_data=sigma_data,
    )
    losses = []
    done = 0
    while done < steps:
        student, opt_state, l = run(
            student, opt_state, params, imgs, key, jnp.asarray(done, jnp.int32)
        )
        done += int(l.shape[0])
        losses.extend(np.asarray(l).tolist())
        if log and done % 1000 < steps_per_dispatch:
            log(
                f"[consistency] step {done}: loss "
                f"{float(np.mean(losses[-50:])):.4f}"
            )
    return student, grid, losses


def consistency_distill_checkpoint(
    teacher_ckpt: str,
    imgs,
    *,
    n_grid: int = 18,
    steps: int = 4000,
    batch_size: int = 64,
    lr: float = 1e-4,
    compute_dtype: str | None = "bfloat16",
    prefer_ema: bool = True,
    seed: int = 0,
    out_path: str = "consistency_model.npz",
    log=print,
):
    """Load a trained DDPM checkpoint, consistency-distill it, and save a
    checkpoint whose ``consistency`` metadata dispatches the 1-call sampler
    through :func:`igdm_tpu.sampling.auto.sample_from_checkpoint` (the same
    metadata-driven contract as the distill/flow/conditional families —
    config rides the checkpoint, SURVEY.md section 5.6).

    **Latent teachers compose (LCM — latent consistency model):** when the
    teacher carries ``latent`` metadata, ``imgs`` are pixel images that get
    encoded to scaled latents with the teacher's VAE first, distillation
    runs in latent space, and the student checkpoint keeps the ``latent``
    metadata — the dispatcher then samples ONE student call + decode."""
    from igdm_tpu.checkpoint.pytree_io import load_for_sampling, save_checkpoint
    from igdm_tpu.training.train_state import TrainState

    params, state, meta = load_for_sampling(teacher_ckpt, prefer_ema=prefer_ema)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    # tolerant of extra/unknown metadata keys, like every other loader
    # (sampling/auto.py, bench.py): forward/backward-compatible checkpoints
    diff_cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
    model_kind = meta.get("model", "unet4")
    objective = (meta.get("train_cfg") or {}).get("objective", "eps")

    latent_meta = meta.get("latent")
    sigma_data = SIGMA_DATA  # std of [-1,1] pixel data (Karras convention)
    if latent_meta is not None:
        from igdm_tpu.models import autoencoder
        from igdm_tpu.training.latent import load_autoencoder, resolve_ae_path

        from igdm_tpu.sampling.auto import _lmeta_scale

        ae_params, _ = load_autoencoder(resolve_ae_path(teacher_ckpt, latent_meta))
        mean, _ = jax.jit(autoencoder.encode)(ae_params, jnp.asarray(imgs, jnp.float32))
        # scale is REQUIRED (shared guard): silently distilling on
        # unscaled latents would also poison sigma_data below
        imgs = mean * _lmeta_scale(latent_meta)
        # the scaled latents are ~unit-std, not pixel-std: sigma_data must
        # match the data the consistency parameterization runs on, or the
        # c_skip/c_out balance is systematically off (round-4 review)
        sigma_data = float(jnp.std(imgs))
        if log:
            log(f"[consistency] latent teacher: distilling in "
                f"{tuple(imgs.shape[1:])} latent space (sigma_data={sigma_data:.3f})")

    student, grid, losses = consistency_distill(
        params, imgs, diff_cfg=diff_cfg, objective=objective, n_grid=n_grid,
        steps=steps, batch_size=batch_size, lr=lr, model_kind=model_kind,
        compute_dtype=compute_dtype, key=jax.random.PRNGKey(seed), log=log,
        model_state=state or None, sigma_data=sigma_data,
    )
    save_state = TrainState(
        params=student, model_state=state or {}, opt_state={},
        step=jnp.asarray(len(losses), jnp.int32), rng=jax.random.PRNGKey(seed),
        ema_params=None,
    )
    extra = {"latent": latent_meta} if latent_meta is not None else {}
    save_checkpoint(
        out_path, save_state, diff_cfg=diff_cfg, model=model_kind,
        data=meta.get("data", {}),
        consistency={
            "grid": [int(g) for g in grid], "sigma_data": sigma_data,
            "teacher": str(teacher_ckpt), "steps_trained": int(len(losses)),
            "default_steps": 1,
        },
        losses=losses,
        **extra,
    )
    return out_path, student, grid, losses
