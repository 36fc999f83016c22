"""Flow-matching ODE sampling: integrate the learned velocity field from
noise (t=1) to data (t=0).

Pairs with :mod:`igdm_tpu.training.flow`. Unlike the stochastic DDPM
samplers there is no noise injection after t=1 — sampling is a
deterministic ODE solve, so the whole trajectory is one ``lax.scan`` whose
body is just the model forward plus an axpy (Euler) or two forwards plus
an average (Heun). The reference has no counterpart (its samplers are the
host-loop ancestral chains at src/generate_images.jl:231-245 and
last_desperate_attempt/src/sample.jl:120-165); this is a framework
extension in the same TPU shape as every other sampler here: zero
collectives, zero host round-trips inside the scan, one transfer at the
end.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from igdm_tpu.models import unet4
from igdm_tpu.training.flow import TIME_SCALE


def make_flow_velocity_fn(params, *, time_scale: float = TIME_SCALE, compute_dtype=None,
                          act_scales=None):
    """Wrap unet4 params as ``velocity_fn(x, t_scalar) -> v`` with the
    training-time conditioning convention (t in [0,1] scaled by
    ``time_scale`` into the sinusoidal embedding domain).

    act_scales: static per-conv activation scales for
    ``compute_dtype="int8"`` (see :func:`calibrate_flow_int8`)."""

    def velocity_fn(x, t):
        ts = jnp.full((x.shape[0],), t, jnp.float32) * time_scale
        return unet4.apply(
            params, x, ts, final_sigmoid=False, compute_dtype=compute_dtype,
            act_scales=act_scales,
        )

    return velocity_fn


def calibrate_flow_int8(
    params,
    key,
    *,
    steps: int = 1,
    method: str = "euler",
    time_scale: float = TIME_SCALE,
    num_images: int = 256,
    image_size=(32, 32),
    channels: int = 1,
    n_keys: int = 2,
    headroom: float = 1.05,
):
    """Per-conv activation scales for the int8 flow serving path.

    Runs the ACTUAL ODE trajectory (eager, python-stepped — serving step
    counts are 1-8) recording each conv input's abs-max at every
    evaluation point across ``n_keys`` noise draws, then adds ``headroom``.
    Static scales remove the per-conv abs-max pass that made dynamic
    quantization a net loss on bandwidth-bound paths (BASELINE.md round-5
    int8 section); the chip A/B for reflow-1 measured +18% over bf16 at
    statistically identical 512x3 quality."""
    if method not in ("euler", "heun"):
        # validate BEFORE the eager calibration forwards — sample_flow_ode
        # would only reject the method after minutes of wasted TPU work
        raise ValueError(f"unknown flow ODE method {method!r}")
    from igdm_tpu.ops.quant import finalize_scales

    H, W = image_size
    amax: dict = {}
    rec = unet4.recording_apply(amax)

    def vfn(x, t):
        ts = jnp.full((x.shape[0],), t, jnp.float32) * time_scale
        return rec(params, x, ts, final_sigmoid=False)

    import numpy as _np

    tgrid = _np.linspace(1.0, 0.0, steps + 1)
    for i in range(n_keys):
        x = jax.random.normal(
            jax.random.fold_in(key, i), (num_images, H, W, channels), jnp.float32
        )
        for t_cur, t_next in zip(tgrid[:-1], tgrid[1:]):
            dt = float(t_next - t_cur)
            v = vfn(x, float(t_cur))
            if method == "euler":
                x = x + dt * v
            else:  # heun — both evaluation points contribute statistics
                x_pred = x + dt * v
                v_next = vfn(x_pred, float(t_next))
                x = x + dt * 0.5 * (v + v_next)
    return finalize_scales(amax, headroom=headroom)


def sample_flow_ode(
    velocity_fn,
    key,
    *,
    num_images: int = 16,
    image_size=(32, 32),
    channels: int = 1,
    steps: int = 32,
    method: str = "euler",
    x_init=None,
):
    """Integrate dx/dt = v(x, t) from t=1 (x ~ N(0,I)) to t=0.

    Args:
      velocity_fn: callable (x, t_scalar) -> velocity, traced under scan.
      steps: number of integration steps (uniform grid on [0, 1]).
      method: "euler" (1 model call/step) or "heun" (2 calls/step,
        2nd-order — the EDM-style solver choice; at equal model-call
        budget Heun at N/2 steps usually beats Euler at N).
      x_init: optional explicit t=1 state (N,H,W,C) overriding the draw
        from ``key`` — reflow's coupling generation passes the noise it
        keeps as the training input (training/flow.generate_coupling).

    Returns (N, H, W, C) samples at t=0 (unclamped, data scale [-1,1]).
    """
    if method not in ("euler", "heun"):
        raise ValueError(f"unknown flow ODE method {method!r}")
    H, W = image_size
    if x_init is not None:
        x = x_init
    else:
        x = jax.random.normal(key, (num_images, H, W, channels), jnp.float32)
    # t grid 1 -> 0; scan over (t_cur, t_next) pairs
    tgrid = jnp.linspace(1.0, 0.0, steps + 1)

    def body(x, tpair):
        t_cur, t_next = tpair
        dt = t_next - t_cur  # negative
        v = velocity_fn(x, t_cur)
        if method == "euler":
            return x + dt * v, None
        x_pred = x + dt * v
        v_next = velocity_fn(x_pred, t_next)
        return x + dt * 0.5 * (v + v_next), None

    x, _ = jax.lax.scan(body, x, (tgrid[:-1], tgrid[1:]))
    return x


def make_flow_sampler(
    params,
    *,
    num_images: int = 256,
    image_size=(32, 32),
    channels: int = 1,
    steps: int = 8,
    method: str = "euler",
    time_scale: float = TIME_SCALE,
    compute_dtype=None,
    act_scales=None,
):
    """Compile a serving-style flow sampler: weights baked in as XLA
    constants, ``fn(key) -> images`` in ``steps`` (Euler) or ``2*steps``
    (Heun) deterministic model calls — the flow-family counterpart of
    :func:`igdm_tpu.sampling.ancestral.make_distilled_sampler`. Use with a
    reflowed checkpoint (training/flow.train_reflow) for the few-step
    low-latency operating points; ``compute_dtype=jnp.bfloat16`` runs the
    U-Net convs at the MXU bf16 rate with the ODE update kept in f32, and
    ``compute_dtype="int8"`` the int8 MXU path (auto-calibrating static
    activation scales here unless ``act_scales`` is given — measured +18%
    over bf16 at statistically identical 512x3 quality for pixel
    reflow-1; NOT recommended for 8x8-latent students, where tiny tensors
    make the quantization glue a net loss — BASELINE.md round-5 int8
    section)."""
    if compute_dtype == "int8" and act_scales is None:
        act_scales = calibrate_flow_int8(
            params, jax.random.PRNGKey(0), steps=steps, method=method,
            time_scale=time_scale, num_images=min(num_images, 256),
            image_size=tuple(image_size), channels=channels,
        )
    vfn = make_flow_velocity_fn(
        params, time_scale=time_scale, compute_dtype=compute_dtype,
        act_scales=act_scales,
    )
    H, W = image_size

    @jax.jit
    def fn(key):
        return sample_flow_ode(
            vfn, key, num_images=num_images, image_size=(H, W),
            channels=channels, steps=steps, method=method,
        )

    return fn


@partial(
    jax.jit,
    static_argnames=(
        "num_images", "image_size", "channels", "steps", "method", "time_scale",
        "compute_dtype",
    ),
)
def sample_flow(
    params,
    key,
    *,
    num_images: int = 16,
    image_size=(32, 32),
    channels: int = 1,
    steps: int = 32,
    method: str = "euler",
    time_scale: float = TIME_SCALE,
    compute_dtype=None,
):
    """Sample from a trained rectified-flow unet4 (one jitted program)."""
    vfn = make_flow_velocity_fn(params, time_scale=time_scale, compute_dtype=compute_dtype)
    return sample_flow_ode(
        vfn, key, num_images=num_images, image_size=tuple(image_size),
        channels=channels, steps=steps, method=method,
    )
