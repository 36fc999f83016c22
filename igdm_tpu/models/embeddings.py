"""Sinusoidal time/position embeddings.

Two variants exist in the reference and differ in layout and frequency base:

* ``timestep_embedding`` — interleaved sin/cos with frequency
  exp(-log(1e4) * 2*(i-1)/(D-1)); used by the DDPM scripts
  (src/train_brain.jl:54-63, duplicated in src/generate_images.jl:143-155 and
  last_desperate_attempt/src/shared.jl:42-51).
* ``sinusoidal_embedding`` — concatenated [sin | cos] halves with frequency
  base exp(-log(1e4)/(dim/2-1) * k); exported-module helper
  (src/ImageGenerationDiffusionModels.jl:186-193), tested directly by the
  reference test suite (test/runtests.jl:46-50).

Both are fully traced functions of the (possibly scanned) timestep value —
no host-side embedding tables — so they live inside jit/scan bodies.
"""

from __future__ import annotations

import jax.numpy as jnp


def timestep_embedding(t, dim: int = 128):
    """Interleaved sin/cos embedding for integer timestep(s).

    Args:
      t: scalar or (B,) array of timesteps (float or int; traced OK).
      dim: embedding width D (even).

    Returns (dim,) for scalar t, (B, dim) for batched t.
    """
    t = jnp.asarray(t, jnp.float32)
    half = dim // 2
    i = jnp.arange(half, dtype=jnp.float32)
    freqs = jnp.exp(-jnp.log(1e4) * (2.0 * i / (dim - 1)))
    angles = t[..., None] * freqs  # (..., half)
    pe = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1)  # (..., half, 2)
    return pe.reshape(*t.shape, dim)


def sinusoidal_embedding(t, dim: int):
    """Concatenated [sin | cos] embedding; shape (len(t), dim)."""
    t = jnp.asarray(t, jnp.float32).reshape(-1)
    half = dim // 2
    scale = jnp.log(10000.0) / (half - 1)
    freqs = jnp.exp(-scale * jnp.arange(half, dtype=jnp.float32))
    angles = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=1)
