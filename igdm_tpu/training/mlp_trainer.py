"""Training for the one-shot MLP denoiser (noisy -> clean regression).

The reference's ``train_brain`` (src/ImageGenerationDiffusionModels.jl:128-161)
loads the 500 images, noises each once with ``apply_noise``, and runs
per-sample ``Flux.train!`` steps with ADAM — 500 singleton steps per epoch on
host. Here: the 500 (noisy, clean) pairs are built with the closed-form
noise transform, moved to device once, and each epoch is a single compiled
``lax.scan`` over shuffled minibatches. Early stopping follows the README's
documented ``train(data, lr, epochs, patience, min_delta)`` contract
(README.md:23).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from igdm_tpu.diffusion.processes import apply_noise_coeffs
from igdm_tpu.models import mlp


def build_pairs(imgs: np.ndarray, key, *, num_noise_steps=500, beta_min=1e-4, beta_max=0.02):
    """(N,H,W,C) clean images -> (noisy, clean) flat pairs, each noised with
    its own single epsilon like the reference's per-image apply_noise call
    (src/ImageGenerationDiffusionModels.jl:136)."""
    x = jnp.asarray(imgs[..., 0] if imgs.ndim == 4 else imgs, jnp.float32)  # (N,H,W)
    a, b = apply_noise_coeffs(num_noise_steps, beta_min, beta_max)
    eps = jax.random.normal(key, x.shape, jnp.float32)
    noisy = a * x + b * eps
    # column-major flatten to match the reference's reshape(mat, :, 1)
    flat = lambda z: z.transpose(0, 2, 1).reshape(z.shape[0], -1)
    return flat(noisy), flat(x)


def train_mlp(
    imgs: np.ndarray,
    *,
    lr: float = 1e-3,
    epochs: int = 100,
    patience: int | None = None,
    min_delta: float = 0.0,
    batch_size: int = 100,
    seed: int = 0,
    params=None,
    log: Callable[[str], None] | None = None,
):
    """Train the MLP; returns (params, losses).

    Defaults mirror the reference: ADAM at Flux's default lr=1e-3
    (src/ImageGenerationDiffusionModels.jl:147 uses ADAM() with no lr).
    Pass patience/min_delta for the README-documented early stopping.
    """
    key = jax.random.PRNGKey(seed)
    k_init, k_noise, k_shuf = jax.random.split(key, 3)
    if params is None:
        params = mlp.init(k_init)
    noisy, clean = build_pairs(imgs, k_noise)
    n = noisy.shape[0]
    n_batches = -(-n // batch_size)

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, x, y):
        return jnp.mean(jnp.square(mlp.apply(p, x) - y))

    grad_fn = jax.value_and_grad(loss_fn)

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(p, opt, epoch_idx):
        kp = jax.random.fold_in(k_shuf, epoch_idx)
        perm = jax.random.permutation(kp, n)

        def body(carry, bidx):
            p, opt = carry
            pos = (bidx * batch_size + jnp.arange(batch_size)) % n
            idx = perm[pos]
            loss, grads = grad_fn(p, jnp.take(noisy, idx, axis=0), jnp.take(clean, idx, axis=0))
            updates, opt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), opt), loss

        (p, opt), losses = jax.lax.scan(body, (p, opt), jnp.arange(n_batches))
        return p, opt, jnp.mean(losses)

    losses = []
    best = float("inf")
    no_improve = 0
    for epoch in range(1, epochs + 1):
        params, opt_state, loss = epoch_fn(params, opt_state, epoch)
        loss = float(loss)
        losses.append(loss)
        if log and epoch % 10 == 0:
            log(f" epoch {epoch} -> training loss = {loss:.6f}")
        if patience is not None:
            if loss < best - min_delta:
                best, no_improve = loss, 0
            else:
                no_improve += 1
                if no_improve > patience:
                    if log:
                        log(f"Early stopping at epoch {epoch}")
                    break
    return params, losses
