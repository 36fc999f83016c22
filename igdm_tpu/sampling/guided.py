"""Classifier-free guided sampling (Ho & Salimans 2022).

The reference is unconditional-only (all three model generations,
SURVEY.md section 2); class conditioning + guidance is a framework
extension. Works with class-conditional unet4 models
(``unet4.init(num_classes=...)`` + ``training/conditional.py``).

TPU shape: the conditional and unconditional branches run as ONE
doubled-batch model call per denoise step (concat along batch, labels
``[y..., NULL...]``) inside a single ``lax.scan`` — one XLA program for
the whole trajectory, 2x the FLOPs of unguided sampling and zero extra
dispatches.
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


def sample_cfg(
    params,
    key,
    labels,
    *,
    guidance_scale: float = 3.0,
    cfg: DiffusionConfig | None = None,
    num_sample_steps: int = 50,
    eta: float = 0.0,
    image_size: tuple = (32, 32),
    channels: int = 1,
    objective: str = "eps",
    compute_dtype=None,
    clip_x0: bool = True,
):
    """Guided DDIM sampling: one image per entry of ``labels``.

    ``clip_x0=False`` disables the [-1,1] x0 clamp and the final clip —
    required when guiding in a latent space (sampling/latent.py).

    eps_guided = eps_uncond + s * (eps_cond - eps_uncond); s=0 is the pure
    unconditional model, s=1 the pure conditional one, s>1 over-emphasizes
    the class signal. ``objective="v"`` converts v-predictions to eps via
    the exact variance-preserving identity before mixing.
    """
    cfg = cfg or DiffusionConfig()
    labels = jnp.asarray(labels, jnp.int32)
    alpha_bar = _alpha_bar(cfg)
    ts, ts_prev = strided_ddim_grid(cfg.num_steps, num_sample_steps)
    return _sample_cfg_impl(
        params, key, labels, alpha_bar,
        jnp.asarray(ts.copy()), jnp.asarray(ts_prev.copy()),
        guidance_scale=float(guidance_scale), eta=float(eta),
        image_size=tuple(image_size), channels=channels,
        objective=objective, compute_dtype=compute_dtype, clip_x0=clip_x0,
    )


@partial(
    jax.jit,
    static_argnames=(
        "guidance_scale", "eta", "image_size", "channels", "objective",
        "compute_dtype", "clip_x0",
    ),
)
def _sample_cfg_impl(
    params, key, labels, alpha_bar, ts, ts_prev,
    *, guidance_scale, eta, image_size, channels, objective, compute_dtype,
    clip_x0=True,
):
    num_images = labels.shape[0]
    h, w = image_size
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, (num_images, h, w, channels), jnp.float32)
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), alpha_bar])
    null = params["class_emb"]["table"].shape[0] - 1
    lab2 = jnp.concatenate([labels, jnp.full_like(labels, null)])

    def to_eps(pred, xb, t):
        if objective == "eps":
            return pred
        ab = ab_ext[t]
        return jnp.sqrt(1.0 - ab) * xb + jnp.sqrt(ab) * pred

    def body(x, inputs):
        t, t_prev, i = inputs
        x2 = jnp.concatenate([x, x])
        t2 = jnp.full((2 * num_images,), t)
        pred = unet4.apply(
            params, x2, t2, final_sigmoid=False, labels=lab2,
            compute_dtype=compute_dtype,
        )
        eps2 = to_eps(pred, x2, t)
        eps_c, eps_u = eps2[:num_images], eps2[num_images:]
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        noise = (
            jax.random.normal(jax.random.fold_in(k_loop, i), x.shape, jnp.float32)
            if eta > 0
            else None
        )
        x = ddim_step(x, eps, ab_ext[t], ab_ext[t_prev], eta=eta, noise=noise,
                      clip_x0=clip_x0)
        return x, None

    x, _ = jax.lax.scan(body, x, (ts, ts_prev, jnp.arange(ts.shape[0])))
    return jnp.clip(x, -1.0, 1.0) if clip_x0 else x
