"""Sampling from consistency-distilled models (training/consistency.py).

One model call maps pure noise straight to data: x0 = f(x_T, T). The
optional multistep refinement (Song et al. 2023, alg. 1) re-noises the
estimate to intermediate grid points and re-applies f — each extra step is
one more model call, trading latency for fidelity without any solver.

Serving shape mirrors the other few-step families
(ancestral.make_distilled_sampler, flow.make_flow_sampler): weights baked
into the program as XLA constants, the whole trajectory one fused jitted
program, ``fn(key) -> images``. The reference's only sampler is the T-step
host loop at src/generate_images.jl:231-245.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from igdm_tpu.config import DiffusionConfig
from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config
from igdm_tpu.training.consistency import SIGMA_DATA, consistency_fn
from igdm_tpu.training.distill import _coeffs


def _mid_indices(n_grid: int, steps: int) -> np.ndarray:
    """Descending grid indices for the re-noise points of an S-step sample.

    Interior midpoints of an even partition of [0, n_grid] (Song et al. 2023,
    alg. 1): steps=2 re-noises at the mid-grid point (t ~ T/2, where the
    signal coefficient is still large), not at the extreme boundaries —
    re-noising at index n_grid-1 keeps only ~9% of the step-1 estimate on
    a T=500 linear schedule (nearly an independent resample), and index 1
    is a near-identity call (f ~ id by the boundary condition)."""
    if steps < 2:
        return np.zeros((0,), np.int64)
    pts = np.round(np.linspace(n_grid, 0, steps + 1)).astype(np.int64)[1:-1]
    pts = pts[(pts > 0) & (pts < n_grid)]
    return np.unique(pts)[::-1]


def _sample_consistency_impl(
    params, mstate, key, ab_ext, grid, mids, *, num_images, image_size,
    channels, apply_fn, sigma_data,
):
    H, W = image_size
    k0, km = jax.random.split(key)
    x = jax.random.normal(k0, (num_images, H, W, channels), jnp.float32)
    tb = jnp.full((num_images,), grid[-1], jnp.int32)
    x0 = consistency_fn(apply_fn, params, mstate, x, tb, ab_ext, sigma_data)
    if mids.shape[0] == 0:
        return x0

    def body(x0, inputs):
        i, n = inputs
        t = jnp.full((num_images,), grid[n], jnp.int32)
        a_t, s_t = (c.reshape(-1, 1, 1, 1) for c in _coeffs(ab_ext, t))
        eps = jax.random.normal(jax.random.fold_in(km, i), x0.shape, jnp.float32)
        x_t = a_t * x0 + s_t * eps
        x0 = consistency_fn(apply_fn, params, mstate, x_t, t, ab_ext, sigma_data)
        return x0, None

    x0, _ = jax.lax.scan(body, x0, (jnp.arange(mids.shape[0]), mids))
    return x0


def sample_consistency(
    params,
    grid,
    key,
    *,
    num_images: int = 16,
    steps: int = 1,
    cfg: DiffusionConfig | None = None,
    image_size: tuple = (32, 32),
    channels: int = 1,
    model_kind: str = "unet4",
    model_state=None,
    sigma_data: float = SIGMA_DATA,
    compute_dtype=None,
):
    """Sample with ``steps`` model calls (1 = pure consistency sampling).

    ``grid`` is the distillation sub-grid returned by
    :func:`igdm_tpu.training.consistency.consistency_distill`. Returns
    (N, H, W, C) images in [-1, 1] (unclamped, like every sampler here).
    """
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    ab = jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), ab])
    g = jnp.asarray(np.asarray(grid), jnp.int32)
    mids = jnp.asarray(_mid_indices(int(g.shape[0]) - 1, steps), jnp.int32)
    apply_fn = make_apply_fn(model_kind, cfg.embed_dim, compute_dtype=compute_dtype)
    mstate = model_state if model_state is not None else {}

    impl = jax.jit(
        _sample_consistency_impl,
        static_argnames=("num_images", "image_size", "channels", "apply_fn",
                         "sigma_data"),
    )
    return impl(
        params, mstate, key, ab_ext, g, mids, num_images=num_images,
        image_size=tuple(image_size), channels=channels, apply_fn=apply_fn,
        sigma_data=sigma_data,
    )


def calibrate_consistency_int8(
    params,
    grid,
    key,
    *,
    cfg: DiffusionConfig | None = None,
    num_images: int = 256,
    steps: int = 1,
    image_size: tuple = (32, 32),
    channels: int = 1,
    model_state=None,
    sigma_data: float = SIGMA_DATA,
    n_keys: int = 2,
    headroom: float = 1.05,
):
    """Per-conv activation scales for the int8 consistency serving path
    (unet4 only): replays the ACTUAL sampling recursion eagerly (python-
    stepped; serving step counts are 1-4) recording each conv input's
    abs-max across ``n_keys`` noise draws. Counterpart of
    :func:`igdm_tpu.sampling.flow.calibrate_flow_int8`."""
    from igdm_tpu.models import unet4

    cfg = cfg or DiffusionConfig()
    ab = jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), ab])
    g = np.asarray(grid)
    mids = _mid_indices(int(g.shape[0]) - 1, steps)
    mstate = model_state if model_state is not None else {}
    H, W = image_size
    amax: dict = {}
    rec = unet4.recording_apply(amax)

    def apply_fn(p, ms, x_t, ts, train):
        return rec(p, x_t, ts, final_sigmoid=False), ms

    for i in range(n_keys):
        k0, km = jax.random.split(jax.random.fold_in(key, i))
        x = jax.random.normal(k0, (num_images, H, W, channels), jnp.float32)
        tb = jnp.full((num_images,), int(g[-1]), jnp.int32)
        x0 = consistency_fn(apply_fn, params, mstate, x, tb, ab_ext, sigma_data)
        for j, n in enumerate(mids):
            t = jnp.full((num_images,), int(g[n]), jnp.int32)
            a_t, s_t = (c.reshape(-1, 1, 1, 1) for c in _coeffs(ab_ext, t))
            eps = jax.random.normal(jax.random.fold_in(km, j), x0.shape, jnp.float32)
            x0 = consistency_fn(
                apply_fn, params, mstate, a_t * x0 + s_t * eps, t, ab_ext, sigma_data
            )
    from igdm_tpu.ops.quant import finalize_scales

    return finalize_scales(amax, headroom=headroom)


def make_consistency_sampler(
    params,
    grid,
    *,
    cfg: DiffusionConfig | None = None,
    num_images: int = 256,
    steps: int = 1,
    image_size: tuple = (32, 32),
    channels: int = 1,
    model_kind: str = "unet4",
    model_state=None,
    sigma_data: float = SIGMA_DATA,
    compute_dtype=None,
    act_scales=None,
):
    """Serving-style sampler: weights baked as XLA constants,
    ``fn(key) -> images`` in ``steps`` model calls (bf16 ``compute_dtype``
    runs the U-Net convs at the MXU bf16 rate; the f/re-noise algebra stays
    f32). ``compute_dtype="int8"`` (unet4 only) runs the convs on the int8
    MXU path with static calibrated activation scales (auto-calibrated
    here unless ``act_scales`` is given) — measured +18%-class gains at
    the pixel 1-call shapes, a net loss at 8x8-latent shapes (BASELINE.md
    round-5 int8 section)."""
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = cfg or DiffusionConfig()
    ab = jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), ab])
    g = jnp.asarray(np.asarray(grid), jnp.int32)
    mids = jnp.asarray(_mid_indices(int(g.shape[0]) - 1, steps), jnp.int32)
    if compute_dtype == "int8":
        if model_kind != "unet4":
            raise ValueError("int8 consistency serving supports unet4 only")
        from igdm_tpu.models import unet4

        if act_scales is None:
            act_scales = calibrate_consistency_int8(
                params, grid, jax.random.PRNGKey(0), cfg=cfg,
                num_images=min(num_images, 256), steps=steps,
                image_size=tuple(image_size), channels=channels,
                model_state=model_state, sigma_data=sigma_data,
            )
        apply_fn = unet4.int8_apply_fn(act_scales)
    else:
        apply_fn = make_apply_fn(model_kind, cfg.embed_dim, compute_dtype=compute_dtype)
    mstate = model_state if model_state is not None else {}

    @jax.jit
    def fn(key):
        return _sample_consistency_impl(
            params, mstate, key, ab_ext, g, mids, num_images=num_images,
            image_size=tuple(image_size), channels=channels,
            apply_fn=apply_fn, sigma_data=sigma_data,
        )

    return fn
