"""SR3-style super-resolution sampling: upscale low-res inputs with a
trained diffusion upscaler (training/superres.py).

Whole trajectory in one ``lax.scan``; the bicubic-upsampled conditioning
image concatenates onto the channel axis at EVERY denoise step (the model
was trained with exactly that input layout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from igdm_tpu.config import DiffusionConfig
from igdm_tpu.diffusion.schedules import strided_ddim_grid
from igdm_tpu.models import unet4
from igdm_tpu.sampling.ancestral import _alpha_bar, ddim_step
from igdm_tpu.training.superres import upsample_to


def sample_superres(
    params,
    lowres,
    key,
    *,
    factor: int = 2,
    cfg: DiffusionConfig | None = None,
    num_sample_steps: int = 50,
    eta: float = 0.0,
    compute_dtype=None,
):
    """Upscale (N,h,w,C) low-res images in [-1,1] to (N, h*factor, w*factor, C).

    DDIM over a strided timestep grid (``eta`` > 0 adds ancestral noise);
    deterministic given (params, lowres, key).
    """
    cfg = cfg or DiffusionConfig()
    lowres = jnp.asarray(lowres, jnp.float32)
    n, h, w, c = lowres.shape
    cond = upsample_to(lowres, (h * factor, w * factor))
    alpha_bar = _alpha_bar(cfg)
    ts, ts_prev = strided_ddim_grid(cfg.num_steps, num_sample_steps)
    return _sample_sr_impl(
        params, cond, key, alpha_bar,
        jnp.asarray(ts.copy()), jnp.asarray(ts_prev.copy()),
        eta=float(eta), compute_dtype=compute_dtype,
    )


@partial(jax.jit, static_argnames=("eta", "compute_dtype"))
def _sample_sr_impl(params, cond, key, alpha_bar, ts, ts_prev, *, eta, compute_dtype):
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, cond.shape, jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), alpha_bar])
    b = cond.shape[0]

    def body(x, inputs):
        t, t_prev, i = inputs
        eps = unet4.apply(
            params, jnp.concatenate([x, cond], axis=-1), jnp.full((b,), t),
            final_sigmoid=False, compute_dtype=compute_dtype,
        )
        noise = (
            jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
            if eta > 0
            else None
        )
        x = ddim_step(x, eps, ab_ext[t], ab_ext[t_prev], eta=eta, noise=noise)
        return x, None

    x, _ = jax.lax.scan(body, x, (ts, ts_prev, jnp.arange(ts.shape[0])))
    return jnp.clip(x, -1.0, 1.0)
