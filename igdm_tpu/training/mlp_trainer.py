"""Training for the one-shot MLP denoiser (noisy -> clean regression).

The reference's ``train_brain`` (src/ImageGenerationDiffusionModels.jl:128-161)
loads the 500 images, noises each once with ``apply_noise``, and runs
per-sample ``Flux.train!`` steps with ADAM — 500 singleton steps per epoch on
host. Here: the 500 (noisy, clean) pairs are built with the closed-form
noise transform, moved to device once, and the epoch loop runs on the shared
scanned-epoch engine (training/engine.py) — the MLP trainer is just a batch
loss function. Early stopping follows the README's documented
``train(data, lr, epochs, patience, min_delta)`` contract (README.md:23).
"""

from __future__ import annotations

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
    from igdm_tpu.config import TrainConfig
    from igdm_tpu.training.ddpm import TrainResult
    from igdm_tpu.training.engine import build_scanned_epoch, run_epoch_loop
    from igdm_tpu.training.train_state import TrainState

    key = jax.random.PRNGKey(seed)
    k_init, k_noise, k_shuf = jax.random.split(key, 3)
    if params is None:
        params = mlp.init(k_init)
    noisy, clean = build_pairs(imgs, k_noise)
    n = noisy.shape[0]

    tx = optax.adam(lr)
    state = TrainState(
        params=params, model_state={}, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32), rng=k_shuf,
    )

    def batch_loss(p, model_state, kb, idx, mask, noisy, clean):
        x = jnp.take(noisy, idx, axis=0)
        y = jnp.take(clean, idx, axis=0)
        return jnp.mean(jnp.square(mlp.apply(p, x) - y)), model_state

    # always use_scan: a 2-layer MLP scans fine on XLA:CPU (the conv caveat
    # in build_scanned_epoch's docstring doesn't apply to dense matmuls)
    epoch_fn = build_scanned_epoch(
        tx, n, batch_size, batch_loss, use_scan=True
    )
    result = TrainResult(state=state)

    def on_block_end(epoch, _blk, _st, _best, _ni):
        if log and epoch % 10 == 0:
            log(f" epoch {epoch} -> training loss = {result.losses[-1]:.6f}")

    loop_cfg = TrainConfig(
        epochs=epochs,
        patience=patience if patience is not None else 10**9,
        min_delta=min_delta,
    )
    run_epoch_loop(
        state, (noisy, clean), epoch_fn, epoch_fn, 1, loop_cfg, result,
        log=None, on_block_end=on_block_end,
    )
    if result.stopped_early and log:
        log(f"Early stopping at epoch {result.epochs_run}")
    return result.state.params, result.losses
