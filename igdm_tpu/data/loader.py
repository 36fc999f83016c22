"""Host-side batch iteration.

The reference uses a Julia ``Channel`` producer task yielding permuted views
(src/train_brain.jl:197-206). On TPU the equivalent is simpler and faster:
the whole 1.7 MB dataset lives on device; per-epoch we generate a permutation
and slice batches with ``jnp.take`` inside jit, so the host never touches
image bytes after the initial transfer. This module provides the host
fallback/general iterator used for arbitrary datasets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def epoch_batches(
    imgs: np.ndarray,
    batch_size: int,
    rng: np.random.Generator | None = None,
    *,
    drop_remainder: bool = False,
) -> Iterator[np.ndarray]:
    """Yield shuffled minibatches (N,H,W,C) for one epoch.

    Matches the reference's semantics: fresh permutation per epoch, final
    short batch kept (src/train_brain.jl:199-204) unless drop_remainder.
    """
    rng = rng or np.random.default_rng()
    n = imgs.shape[0]
    perm = rng.permutation(n)
    for i in range(0, n, batch_size):
        sel = perm[i : i + batch_size]
        if drop_remainder and sel.shape[0] < batch_size:
            return
        yield imgs[sel]


def pad_batch(batch: np.ndarray, batch_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad a short batch to full size, returning (padded, valid_mask).

    TPU/XLA wants static shapes: rather than recompiling for the final short
    batch of an epoch, pad it and mask the loss.
    """
    n = batch.shape[0]
    if n == batch_size:
        return batch, np.ones((batch_size,), np.float32)
    reps = int(np.ceil(batch_size / n))
    padded = np.concatenate([batch] * reps, axis=0)[:batch_size]
    mask = np.zeros((batch_size,), np.float32)
    mask[:n] = 1.0
    return padded, mask
