"""Dataset loading.

The reference bundles ``SyntheticImages500.mat`` — a MATLAB v5 file with one
variable ``syntheticImages`` of shape (32, 32, 1, 500) float32, value range
roughly [-1.07, 1.14] (reference: src/ImageGenerationDiffusionModels.jl:26-28,
src/train_brain.jl:248-251).

We load via scipy and return images in the TPU-native **NHWC** layout
(N, H, W, C) as float32 — the layout XLA tiles best on TPU — instead of the
reference's Julia WHCN.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.io import loadmat

_DEFAULT_CANDIDATES = (
    os.environ.get("IGDM_DATASET", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "SyntheticImages500.mat"),
    "/root/reference/SyntheticImages500.mat",
)


def dataset_path() -> str:
    """Locate the bundled dataset (env override IGDM_DATASET wins)."""
    for p in _DEFAULT_CANDIDATES:
        if p and os.path.isfile(p):
            return os.path.abspath(p)
    raise FileNotFoundError(
        "SyntheticImages500.mat not found; set IGDM_DATASET to its path"
    )


def load_synthetic_images(path: str | None = None, *, key: str = "syntheticImages") -> np.ndarray:
    """Load the synthetic image dataset as (N, H, W, C) float32.

    The .mat variable is (H, W, C, N) = (32, 32, 1, 500); transpose to NHWC.
    """
    mat = loadmat(path or dataset_path())
    raw = mat[key]
    if raw.ndim == 3:  # (H, W, N)
        raw = raw[:, :, None, :]
    if raw.ndim != 4:
        raise ValueError(f"expected 3-D or 4-D array for {key!r}, got {raw.shape}")
    return np.ascontiguousarray(np.transpose(raw, (3, 0, 1, 2))).astype(np.float32)


def normalize_pm1(imgs: np.ndarray) -> np.ndarray:
    """Reference script scaling to [-1, 1]: x*2 - 1 (src/train_brain.jl:251)."""
    return imgs * 2.0 - 1.0


def denormalize_pm1(imgs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`normalize_pm1` ((x+1)/2, src/generate_images.jl:259)."""
    return (imgs + 1.0) / 2.0


def normalize_zscore(imgs: np.ndarray) -> tuple[np.ndarray, float, float]:
    """Z-score normalization returning (imgs, mu, sigma).

    Reference: last_desperate_attempt/src/train_net.jl:95-101 — mu/sigma are
    saved with every checkpoint so sampling can denormalize.
    """
    mu = float(imgs.mean())
    sigma = float(imgs.std())
    return (imgs - mu) / sigma, mu, sigma
