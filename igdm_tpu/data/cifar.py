"""CIFAR-10 loading (stretch config, BASELINE.json: "CIFAR-10 32x32 + 64x64
U-Net with 50-step DDIM fast sampler").

Reads the standard python-pickle batch files (data_batch_1..5, test_batch)
from a local directory — this environment has no network egress, so the
archive must already be on disk. Returns NHWC float32 in [0, 1], optionally
converted to grayscale (the reference pipeline is single-channel).

The reference declares MLDatasets (Project.toml:12) and has a dead MNIST
loader (src/ImageGenerationDiffusionModels.jl:343-347, broken: missing
imports); this is the working equivalent.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

_GRAY = np.asarray([0.299, 0.587, 0.114], np.float32)


def _load_batch(path: str) -> tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as fh:
        d = pickle.load(fh, encoding="bytes")
    data = d[b"data"] if b"data" in d else d["data"]
    labels = d.get(b"labels", d.get("labels")) if isinstance(d, dict) else None
    imgs = np.asarray(data, np.uint8).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return imgs, np.asarray(labels, np.int32)


def load_cifar10(
    root: str,
    *,
    split: str = "train",
    grayscale: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Load CIFAR-10 as ((N,32,32,C) float32 in [0,1], (N,) int labels).

    ``root`` is the directory holding data_batch_1..5 / test_batch (the
    extracted cifar-10-batches-py layout; a cifar-10-batches-py subdirectory
    is also searched).
    """
    for candidate in (root, os.path.join(root, "cifar-10-batches-py")):
        if os.path.isfile(os.path.join(candidate, "data_batch_1")):
            root = candidate
            break
    else:
        raise FileNotFoundError(f"no CIFAR-10 batch files under {root!r}")

    names = [f"data_batch_{i}" for i in range(1, 6)] if split == "train" else ["test_batch"]
    imgs_list, labels_list = [], []
    for name in names:
        imgs, labels = _load_batch(os.path.join(root, name))
        imgs_list.append(imgs)
        labels_list.append(labels)
    imgs = np.concatenate(imgs_list).astype(np.float32) / 255.0
    labels = np.concatenate(labels_list)
    if grayscale:
        imgs = (imgs @ _GRAY)[..., None]
    return imgs, labels


def upscale_2x(imgs: np.ndarray) -> np.ndarray:
    """Nearest-neighbor 2x upscale (N,H,W,C) -> (N,2H,2W,C) — builds the
    64x64 stretch configs from 32x32 sources without external data."""
    return np.repeat(np.repeat(imgs, 2, axis=1), 2, axis=2)
