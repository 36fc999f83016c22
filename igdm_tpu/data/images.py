"""Image artifact I/O: grayscale PNGs, grid tiling, heatmap-style saves.

Replaces the reference's Images.jl/FileIO/Plots usage
(src/ImageGenerationDiffusionModels.jl:41,70,96; src/generate_images.jl:262-264).
All functions take host numpy arrays — device arrays are transferred once by
the caller, keeping host<->TPU traffic at the edges of the pipeline.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def _to_u8(gray01: np.ndarray) -> np.ndarray:
    g = np.clip(np.asarray(gray01, dtype=np.float64), 0.0, 1.0)
    return np.round(g * 255.0).astype(np.uint8)


def save_gray_png(img01: np.ndarray, path: str) -> str:
    """Save a 2-D array with values in [0,1] as an 8-bit grayscale PNG.

    Mirrors Julia's ``save(path, colorview(Gray, clamp01.(x)))``
    (src/ImageGenerationDiffusionModels.jl:40-41).
    """
    arr = np.asarray(img01)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    if arr.ndim != 2:
        raise ValueError(f"expected 2-D grayscale image, got shape {arr.shape}")
    Image.fromarray(_to_u8(arr), mode="L").save(path)
    return path


def tile_grid(images: np.ndarray, rows: int = 8, cols: int = 8) -> np.ndarray:
    """Tile the first rows*cols images (N,H,W[,C]) into one (rows*H, cols*W) canvas.

    Reference semantics (src/ImageGenerationDiffusionModels.jl:30-38): image
    index = i*cols + j fills block-row i, block-col j. Returns the *unclamped*
    canvas, exactly like the reference returns ``canvas`` pre-clamp.
    """
    imgs = np.asarray(images)
    if imgs.ndim == 4:
        imgs = imgs[..., 0]
    n, h, w = imgs.shape
    need = rows * cols
    if n < need:
        raise ValueError(f"need {need} images, got {n}")
    canvas = (
        imgs[:need]
        .reshape(rows, cols, h, w)
        .transpose(0, 2, 1, 3)
        .reshape(rows * h, cols * w)
    )
    return np.ascontiguousarray(canvas, dtype=np.float32)


def save_image_heatmap(img01: np.ndarray, path: str, title: str | None = None) -> str:
    """Save an image through matplotlib, analogous to the reference's Plots
    ``heatmap``/``savefig`` output (src/generate_images.jl:262-264)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(img01)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(arr, cmap="gray", vmin=0.0, vmax=1.0)
    ax.set_axis_off()
    if title:
        ax.set_title(title)
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return path


def save_sample_grid(
    samples: np.ndarray, path: str, title: str | None = None,
    ncols: int | None = None,
) -> str:
    """ceil(sqrt(n)) grid of grayscale samples (or a fixed ``ncols``-wide
    grid — the nearest-neighbor panels use paired rows), one PNG.

    Reference: last_desperate_attempt/src/sample.jl:177-202.
    """
    import math

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    imgs = np.asarray(samples)
    rgb = imgs.ndim == 4 and imgs.shape[-1] == 3
    if imgs.ndim == 4 and imgs.shape[-1] == 1:
        imgs = imgs[..., 0]
    n = imgs.shape[0]
    cols = ncols if ncols else math.ceil(math.sqrt(n))
    rows = math.ceil(n / cols)
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.5, rows * 1.5))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        ax.set_axis_off()
        if i < n:
            if rgb:
                ax.imshow(np.clip(imgs[i], 0.0, 1.0))
            else:
                ax.imshow(imgs[i], cmap="gray")
    if title:
        fig.suptitle(title)
    fig.savefig(path, bbox_inches="tight", dpi=150)
    plt.close(fig)
    return path


def save_loss_curve(losses, path: str) -> str:
    """Loss-curve PNG, mirroring training_loss.png (src/train_brain.jl:302-303)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot(list(losses))
    ax.set_title("Training Loss")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return path
