"""Sample-quality metrics.

The reference ships no quality measurement (BASELINE.md: no published
numbers). These are lightweight, dependency-free metrics suited to a
500-image dataset:

* nn_mse — mean MSE from each sample to its nearest dataset neighbor
  (fidelity; lower is better). Computed as one (N_s, N_d) distance matrix on
  device — a single MXU matmul via the ||a-b||^2 expansion.
* coverage — fraction of dataset images that are the nearest neighbor of at
  least one sample (mode coverage; higher is better).
* pairwise_diversity — mean pairwise MSE among the samples themselves
  (collapse detection; ~2x dataset variance is healthy).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _sq_dists(a, b):
    """(Na, Nb) squared L2 distances via the matmul expansion."""
    a = jnp.asarray(a.reshape(a.shape[0], -1), jnp.float32)
    b = jnp.asarray(b.reshape(b.shape[0], -1), jnp.float32)
    aa = jnp.sum(a * a, axis=1, keepdims=True)
    bb = jnp.sum(b * b, axis=1, keepdims=True)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return aa + bb.T - 2.0 * ab


def nn_mse(samples: np.ndarray, dataset: np.ndarray) -> float:
    """Mean nearest-neighbor MSE (per pixel) from samples to the dataset."""
    d = _sq_dists(np.asarray(samples), np.asarray(dataset))
    per_pixel = jnp.min(d, axis=1) / samples.reshape(samples.shape[0], -1).shape[1]
    return float(jnp.mean(per_pixel))


def coverage(samples: np.ndarray, dataset: np.ndarray) -> float:
    """Fraction of dataset images claimed as a nearest neighbor by samples."""
    d = _sq_dists(np.asarray(samples), np.asarray(dataset))
    nn = jnp.argmin(d, axis=1)
    return float(jnp.unique(nn).size / dataset.shape[0])


def pairwise_diversity(samples: np.ndarray) -> float:
    """Mean pairwise per-pixel MSE among samples (0 = total mode collapse)."""
    n = samples.shape[0]
    d = _sq_dists(np.asarray(samples), np.asarray(samples))
    off = jnp.sum(d) / (n * (n - 1))
    return float(off / samples.reshape(n, -1).shape[1])


def evaluate_samples(samples: np.ndarray, dataset: np.ndarray) -> dict:
    return {
        "nn_mse": nn_mse(samples, dataset),
        "coverage": coverage(samples, dataset),
        "pairwise_diversity": pairwise_diversity(samples),
        "n_samples": int(samples.shape[0]),
    }
