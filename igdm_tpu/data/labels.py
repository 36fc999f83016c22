"""Pseudo-labels for the unlabeled reference dataset.

SyntheticImages500.mat carries no class labels (it is a plain (32,32,1,500)
array — SURVEY.md section 2.5), so demonstrating class-conditional
training/guidance on the reference data needs self-derived classes. A tiny
deterministic Lloyd's k-means over downsampled pixels gives stable visual
clusters; real datasets pass their own labels straight to
``training/conditional.train_conditional_ddpm``.
"""

from __future__ import annotations

import numpy as np


def kmeans_labels(
    imgs: np.ndarray, k: int = 8, *, iters: int = 50, seed: int = 0,
    downsample: int = 4,
) -> np.ndarray:
    """Cluster (N, H, W, C) images into k pseudo-classes -> (N,) int32.

    Features are ``downsample`` x ``downsample`` block means (robust to pixel
    noise, 64-d for 32x32 inputs). Deterministic: k-means++ style farthest-
    point init from ``seed``, fixed ``iters`` Lloyd rounds; empty clusters
    re-seeded to the point farthest from its centroid.
    """
    n, h, w = imgs.shape[:3]
    f = imgs.reshape(n, h, w, -1).mean(axis=-1)
    bh, bw = h // downsample, w // downsample
    feats = f[:, : bh * downsample, : bw * downsample]
    feats = feats.reshape(n, bh, downsample, bw, downsample).mean(axis=(2, 4))
    feats = feats.reshape(n, -1).astype(np.float64)

    rng = np.random.default_rng(seed)
    centroids = [feats[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(
            [np.sum((feats - c) ** 2, axis=1) for c in centroids], axis=0
        )
        centroids.append(feats[int(np.argmax(d2))])
    cents = np.stack(centroids)

    labels = np.zeros(n, np.int32)
    for _ in range(iters):
        d2 = ((feats[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        new_labels = d2.argmin(axis=1).astype(np.int32)
        if (new_labels == labels).all() and _ > 0:
            break
        labels = new_labels
        for j in range(k):
            m = labels == j
            if m.any():
                cents[j] = feats[m].mean(axis=0)
            else:  # re-seed an empty cluster to the worst-fit point
                worst = int(np.argmax(d2[np.arange(n), labels]))
                cents[j] = feats[worst]
    return labels
