"""Progressive distillation (Salimans & Ho 2022) — serve the T-step DDPM
with a handful of steps.

The reference can only sample with its full T-step host loop
(src/generate_images.jl:231-245). This module compresses a trained
noise-predictor into a few-step student: in each phase a student with N
sampling steps is trained so ONE of its deterministic DDIM steps matches
TWO teacher steps on the 2N grid, then the student becomes the teacher and
N halves. Students predict v (= alpha*eps - sigma*x0), the paper's stable
parameterization at low step counts; the loss is x0-space MSE with the
truncated-SNR weight max(1, SNR).

TPU shape: each phase runs as jitted ``lax.scan`` dispatches (like
training/ddpm.build_epoch_fn) — per-step RNG derives from fold_in, the
teacher's two DDIM steps and the student update all fuse into one XLA
program; the host only sees scalar losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from igdm_tpu.config import DiffusionConfig
from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config


def _coeffs(ab_ext, t):
    """alpha_t, sigma_t at integer boundaries t in 0..T (per-example OK)."""
    ab = ab_ext[t]
    return jnp.sqrt(ab), jnp.sqrt(jnp.maximum(1.0 - ab, 0.0))


def _to_x0_eps(pred, x, alpha, sigma, objective):
    """(x0, eps) from a model output in either parameterization (exact
    variance-preserving identities; see sampling.ancestral.v_to_eps_apply_fn)."""
    if objective == "eps":
        x0 = (x - sigma * pred) / alpha
        return x0, pred
    x0 = alpha * x - sigma * pred
    eps = sigma * x + alpha * pred
    return x0, eps


def distill_target(x_t, x_s, alpha_t, sigma_t, alpha_s, sigma_s):
    """Solve for the x0 a single deterministic DDIM step t -> s must predict
    to land on x_s: x_s = alpha_s*x0 + sigma_s*(x_t - alpha_t*x0)/sigma_t
    => x0 = (x_s - (sigma_s/sigma_t) x_t) / (alpha_s - (sigma_s/sigma_t) alpha_t).
    At s == 0 (sigma_s = 0) this reduces to x_s itself."""
    ratio = sigma_s / sigma_t
    return (x_s - ratio * x_t) / (alpha_s - ratio * alpha_t)


def _phase_grids(T: int, phases: tuple[int, ...]) -> list[np.ndarray]:
    """Nested boundary grids: the finest grid has 2*phases[0] intervals of
    1..T; each phase grid is every other boundary of the previous, so a
    teacher step pair always lands exactly on student boundaries."""
    fine = np.unique(np.round(np.linspace(0, T, 2 * phases[0] + 1)).astype(np.int64))
    if len(fine) != 2 * phases[0] + 1:
        raise ValueError(f"T={T} too small for {phases[0]}-step distillation")
    grids = []
    g = fine
    for n in phases:
        if len(g) != 2 * n + 1:
            raise ValueError(f"phase {n} does not halve the previous grid")
        g2 = g
        g = g[::2]
        grids.append((g, g2))  # (student grid N+1 pts, teacher grid 2N+1 pts)
    return grids


def make_convert_step_fn(
    tx,
    diff_cfg: DiffusionConfig,
    batch_size: int,
    *,
    model_kind: str = "unet4",
    compute_dtype: str | None = None,
    steps_per_dispatch: int = 50,
    model_state=None,
):
    """Compile the eps->v re-parameterization pre-phase: the student regresses
    the TEACHER'S OWN prediction at the same (x_t, t), converted to v via the
    exact identity v = alpha*eps_hat - sigma*x0_hat. No solver step, no
    target amplification — this isolates learning the new output head from
    learning the 2-step composition (without it, phase 1 must do both at
    once and plateaus far above the later phases' loss floor; measured)."""
    from igdm_tpu.training.ddpm import make_apply_fn

    ab = jnp.asarray(alphas_cumprod(betas_for_config(diff_cfg)), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), ab])
    T = diff_cfg.num_steps
    cdt = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16") else None
    apply_fn = make_apply_fn(model_kind, diff_cfg.embed_dim, compute_dtype=cdt)
    mstate = model_state if model_state is not None else {}

    def loss_fn(params, teacher_params, x0, t, eps):
        a_t, s_t = (c.reshape(-1, 1, 1, 1) for c in _coeffs(ab_ext, t))
        x_t = a_t * x0 + s_t * eps
        eps_hat, _ = apply_fn(teacher_params, mstate, x_t, t, False)
        # clamp the implied x0 to the data envelope before converting: at
        # t ~ T the 1/alpha division amplifies eps error ~1e4x and the raw
        # v target explodes (measured: conversion diverges without this)
        tx0 = jnp.clip((x_t - s_t * eps_hat) / a_t, -4.0, 4.0)
        v_tgt = jax.lax.stop_gradient(a_t * eps_hat - s_t * tx0)
        v_hat, _ = apply_fn(params, mstate, x_t, t, False)
        return jnp.mean(jnp.square(v_hat - v_tgt))

    from igdm_tpu.training.engine import build_step_runner

    return build_step_runner(
        tx, jax.value_and_grad(loss_fn), batch_size, T, steps_per_dispatch
    )


def make_distill_step_fn(
    tx,
    diff_cfg: DiffusionConfig,
    batch_size: int,
    student_grid,
    teacher_grid,
    teacher_objective: str,
    *,
    model_kind: str = "unet4",
    compute_dtype: str | None = "bfloat16",
    steps_per_dispatch: int = 50,
    model_state=None,
):
    """Compile ``steps_per_dispatch`` distillation steps as one lax.scan."""
    from igdm_tpu.training.ddpm import make_apply_fn

    ab = jnp.asarray(alphas_cumprod(betas_for_config(diff_cfg)), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), ab])
    sg = jnp.asarray(student_grid, jnp.int32)  # (N+1,) boundaries 0..T
    tg = jnp.asarray(teacher_grid, jnp.int32)  # (2N+1,)
    N = int(sg.shape[0]) - 1
    cdt = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16") else None
    apply_fn = make_apply_fn(model_kind, diff_cfg.embed_dim, compute_dtype=cdt)
    mstate = model_state if model_state is not None else {}

    def loss_fn(params, teacher_params, x0, ts_idx, eps):
        # boundaries: t = sg[i], mid u = tg[2i-1], s = sg[i-1]
        t = sg[ts_idx]
        u = tg[2 * ts_idx - 1]
        s = sg[ts_idx - 1]
        a_t, s_t = (c.reshape(-1, 1, 1, 1) for c in _coeffs(ab_ext, t))
        a_u, s_u = (c.reshape(-1, 1, 1, 1) for c in _coeffs(ab_ext, u))
        a_s, s_s = (c.reshape(-1, 1, 1, 1) for c in _coeffs(ab_ext, s))
        x_t = a_t * x0 + s_t * eps

        # teacher: two deterministic DDIM steps t -> u -> s (no x0 clamp:
        # the target solve below must invert the exact algebra)
        pred_u, _ = apply_fn(teacher_params, mstate, x_t, t, False)
        tx0, teps = _to_x0_eps(pred_u, x_t, a_t, s_t, teacher_objective)
        x_u = a_u * tx0 + s_u * teps
        pred_s, _ = apply_fn(teacher_params, mstate, x_u, u, False)
        tx0, teps = _to_x0_eps(pred_s, x_u, a_u, s_u, teacher_objective)
        x_s = a_s * tx0 + s_s * teps
        # the solve divides by (alpha_s - ratio*alpha_t), which shrinks as
        # adjacent low-t sigmas converge and amplifies teacher-prediction
        # noise into huge targets (measured: bf16 teachers diverge phase 1
        # without the clip); bound targets to a generous data envelope
        x0_tgt = jax.lax.stop_gradient(
            jnp.clip(distill_target(x_t, x_s, a_t, s_t, a_s, s_s), -4.0, 4.0)
        )

        # student predicts v at t; x0-space loss, truncated-SNR weight.
        # train=False: normalization statistics stay frozen during
        # distillation (standard fine-tuning; unet4's GroupNorm is
        # stateless anyway).
        v_hat, _ = apply_fn(params, mstate, x_t, t, False)
        x0_hat = a_t * x_t - s_t * v_hat
        w = jnp.maximum(1.0, (a_t**2) / jnp.maximum(s_t**2, 1e-8))
        return jnp.mean(w * jnp.square(x0_hat - x0_tgt))

    from igdm_tpu.training.engine import build_step_runner

    # the drawn "t" is a grid index in {1..N}; same runner as the
    # conversion pre-phase, different upper bound
    return build_step_runner(
        tx, jax.value_and_grad(loss_fn), batch_size, N, steps_per_dispatch
    )


def distill_ddpm(
    params,
    imgs,
    *,
    diff_cfg: DiffusionConfig | None = None,
    objective: str = "eps",
    phases: tuple[int, ...] = (64, 32, 16, 8),
    steps_per_phase: int = 2000,
    convert_steps: int = 2000,
    batch_size: int = 64,
    lr: float = 1e-4,
    model_kind: str = "unet4",
    compute_dtype: str | None = None,
    steps_per_dispatch: int = 50,
    key=None,
    log=print,
    model_state=None,
    on_phase_end=None,
):
    """Progressively distill a trained model down to ``phases[-1]`` steps.

    Args:
      params: trained noise-predictor params (becomes the first teacher;
        the student starts as a copy — the paper's initialization).
      imgs: (M, H, W, C) training images in [-1, 1] (kept on device).
      objective: the TEACHER's parameterization ("eps" for the DDPM
        trainers' default, "v" for objective="v" checkpoints). Students
        always predict v; after phase 1 the teacher is a v-student.
      phases: successive student step counts; each must halve the last.
      model_kind: "unet4" (stateless GroupNorm — the quality flagship) or
        "unet_small" (BatchNorm runs in eval mode with its imported
        running statistics; distillation is fine-tuning, so this is the
        standard frozen-statistics choice).
      on_phase_end: optional callback ``(n_steps, student_params,
        student_grid)`` invoked after each halving phase, e.g. to
        snapshot/evaluate the ladder. Note the END of the ladder is the
        servable model; with a short per-phase budget the mid-ladder
        students are unconverged waypoints (measured: the final 8-step
        student beats the 64/32/16-step snapshots on every quality
        metric — BASELINE.md).

    Returns (student_params, student_grid, losses_per_phase) — sample with
    :func:`igdm_tpu.sampling.ancestral.sample_distilled`.
    """
    diff_cfg = diff_cfg or DiffusionConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    imgs = jnp.asarray(imgs, jnp.float32)
    grids = _phase_grids(diff_cfg.num_steps, tuple(phases))

    student = jax.tree_util.tree_map(jnp.array, params)
    teacher = params
    teacher_obj = objective
    losses_per_phase = []

    if objective == "eps" and convert_steps > 0:
        # pre-phase: teach the copied network the v output head before any
        # solver targets (see make_convert_step_fn)
        tx = optax.adam(lr)
        opt_state = tx.init(student)
        run = make_convert_step_fn(
            tx, diff_cfg, batch_size, model_kind=model_kind,
            compute_dtype=compute_dtype, steps_per_dispatch=steps_per_dispatch,
            model_state=model_state,
        )
        kc = jax.random.fold_in(key, 0)
        done = 0
        conv_losses = []
        while done < convert_steps:
            student, opt_state, losses = run(
                student, opt_state, teacher, imgs, kc, jnp.asarray(done, jnp.int32)
            )
            done += int(losses.shape[0])
            conv_losses.extend(np.asarray(losses).tolist())
        if log:
            log(
                f"[distill] eps->v conversion: loss {conv_losses[0]:.4f} -> "
                f"{float(np.mean(conv_losses[-50:])):.4f} ({done} steps)"
            )
        losses_per_phase.append(conv_losses)
        teacher = jax.tree_util.tree_map(jnp.array, student)
        teacher_obj = "v"

    for (sgrid, tgrid), n in zip(grids, phases):
        tx = optax.adam(lr)
        opt_state = tx.init(student)
        run = make_distill_step_fn(
            tx, diff_cfg, batch_size, sgrid, tgrid, teacher_obj,
            model_kind=model_kind, compute_dtype=compute_dtype,
            steps_per_dispatch=steps_per_dispatch, model_state=model_state,
        )
        phase_losses = []
        kp = jax.random.fold_in(key, n)
        done = 0
        while done < steps_per_phase:
            student, opt_state, losses = run(
                student, opt_state, teacher, imgs, kp, jnp.asarray(done, jnp.int32)
            )
            done += int(losses.shape[0])
            phase_losses.extend(np.asarray(losses).tolist())
        if log:
            log(
                f"[distill] phase N={n}: loss {phase_losses[0]:.4f} -> "
                f"{float(np.mean(phase_losses[-50:])):.4f} ({done} steps)"
            )
        losses_per_phase.append(phase_losses)
        teacher = jax.tree_util.tree_map(jnp.array, student)
        teacher_obj = "v"
        if on_phase_end is not None:
            on_phase_end(n, student, sgrid)
    return student, grids[-1][0], losses_per_phase
