"""Public API — the reference README's five-function surface plus aliases.

README.md:14-29 documents: generate_grid, apply_noise, train, denoise_image,
generate_image, and a demo() it never implemented. The module actually
exports train_brain and generate_image_from_noise instead of train /
generate_image (src/ImageGenerationDiffusionModels.jl:351). Per the north
star (BASELINE.json), this API implements the *documented* surface with the
scripts' real DDPM semantics available, and keeps the module's actual names
as aliases.

Like the reference, a module-level MLP denoiser backs denoise_image /
train_brain (src/ImageGenerationDiffusionModels.jl:14-17 makes it a mutable
global). Here the global is a convenience wrapper over pure functions — pass
explicit params to any function to bypass it.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.data.images import save_gray_png, tile_grid
from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
from igdm_tpu.diffusion.processes import apply_noise_coeffs, apply_noise_transform
from igdm_tpu.models import mlp
from igdm_tpu.models.embeddings import sinusoidal_embedding  # re-export  # noqa: F401

# ---------------------------------------------------------------------------
# Global MLP (reference: const model at src/ImageGenerationDiffusionModels.jl:14)
# ---------------------------------------------------------------------------

_GLOBAL_MLP: dict[str, Any] = {"params": None}


def _mlp_params():
    if _GLOBAL_MLP["params"] is None:
        _GLOBAL_MLP["params"] = mlp.init(jax.random.PRNGKey(0))
    return _GLOBAL_MLP["params"]


def reset_model(params=None):
    """Replace (or re-init) the global MLP denoiser."""
    _GLOBAL_MLP["params"] = params


# ---------------------------------------------------------------------------
# The five documented functions
# ---------------------------------------------------------------------------


def generate_grid(output_path: str = "grid.png", dataset: str | None = None) -> np.ndarray:
    """Load SyntheticImages500 and tile the first 64 images into an 8x8 grid.

    Saves the clamped grid to ``output_path`` and returns the *unclamped*
    canvas, exactly like the reference (src/ImageGenerationDiffusionModels.jl:25-43).
    """
    imgs = load_synthetic_images(dataset)  # (500, 32, 32, 1)
    canvas = tile_grid(imgs, 8, 8)
    save_gray_png(canvas, output_path)
    return canvas


def apply_noise(
    img,
    *,
    num_noise_steps: int = 500,
    beta_min: float = 1e-4,
    beta_max: float = 0.02,
    key=None,
    eps=None,
    output_path: str | None = "noisy_img.png",
) -> np.ndarray:
    """Forward-noise an image with the reference's shared-epsilon process.

    The reference's 500-step sequential loop with one shared epsilon
    (src/ImageGenerationDiffusionModels.jl:60-73) collapses to a single fused
    ``a*img + b*eps`` on device (see diffusion.processes.apply_noise_coeffs).
    Pass ``eps`` explicitly for reproducibility/parity; otherwise a key (or a
    fresh nondeterministic seed, matching Julia randn) draws it. Saves the
    clamped image; returns the unclamped noisy array, size-generic.
    """
    img = jnp.asarray(img, jnp.float32)
    a, b = apply_noise_coeffs(num_noise_steps, beta_min, beta_max)
    if eps is None:
        if key is None:
            key = jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**32))
        eps = jax.random.normal(key, img.shape, jnp.float32)
    noisy = apply_noise_transform(img, jnp.asarray(eps, jnp.float32), a, b)
    noisy_np = np.asarray(noisy)
    if output_path:
        save_gray_png(np.clip(noisy_np, 0.0, 1.0), output_path)
    return noisy_np


def denoise_image(
    noisy_img, *, params=None, output_path: str | None = "denoised_img.png"
) -> np.ndarray:
    """One-shot denoise through the (global) MLP; returns (32,32) in [0,1].

    Reference: src/ImageGenerationDiffusionModels.jl:90-98 (hardcodes 32x32
    output; input is flattened column-major).
    """
    params = params or _mlp_params()
    noisy_img = jnp.asarray(noisy_img, jnp.float32)
    if noisy_img.shape != (32, 32):
        raise ValueError(
            f"denoise_image expects a 32x32 image (the MLP denoiser is fixed-size, "
            f"like the reference src/ImageGenerationDiffusionModels.jl:90-98); "
            f"got {noisy_img.shape}"
        )
    x = mlp.flatten_image(noisy_img)
    y = mlp.apply(params, x)
    out = jnp.clip(mlp.unflatten_image(y[0]), 0.0, 1.0)
    out_np = np.asarray(out)
    if output_path:
        save_gray_png(out_np, output_path)
    return out_np


def train(
    data=None,
    lr: float = 1e-4,
    epochs: int = 100,
    patience: int = 10,
    min_delta: float = 0.001,
    *,
    seed: int = 0,
) -> list[float]:
    """Train the global MLP noisy->clean, per the README-documented signature
    train(data, lr, epochs, patience, min_delta) (README.md:23).

    ``data`` may be a .mat path, an (N,H,W[,C]) array, or None (bundled
    dataset). Returns the per-epoch loss history.
    """
    if data is None or isinstance(data, (str, os.PathLike)):
        imgs = load_synthetic_images(data if isinstance(data, str) else None)
    else:
        imgs = np.asarray(data, np.float32)
        if imgs.ndim == 3:
            imgs = imgs[..., None]
    params, losses = _train_mlp_impl(imgs, lr, epochs, patience, min_delta, seed)
    _GLOBAL_MLP["params"] = params
    return losses


def _train_mlp_impl(imgs, lr, epochs, patience, min_delta, seed):
    from igdm_tpu.training.mlp_trainer import train_mlp

    return train_mlp(
        imgs,
        lr=lr,
        epochs=epochs,
        patience=patience,
        min_delta=min_delta,
        seed=seed,
        params=_GLOBAL_MLP["params"],
    )


def train_brain(num_steps: int = 100, *, data=None, seed: int = 0) -> list[float]:
    """Compatibility alias for the module's actual export: trains the global
    MLP for ``num_steps`` epochs with ADAM at Flux's default lr (1e-3), no
    early stopping (src/ImageGenerationDiffusionModels.jl:128-161)."""
    from igdm_tpu.training.mlp_trainer import train_mlp

    imgs = load_synthetic_images(data) if data is None or isinstance(data, str) else np.asarray(data)
    params, losses = train_mlp(imgs, lr=1e-3, epochs=num_steps, seed=seed, params=_GLOBAL_MLP["params"])
    _GLOBAL_MLP["params"] = params
    return losses


def generate_image(
    model=None,
    *,
    num_images: int = 1,
    image_size: tuple = (32, 32),
    key=None,
    cfg: DiffusionConfig | None = None,
    rescale: bool = True,
):
    """Generate images.

    * With ``model=None``: the README's documented behavior — draw noise and
      one-shot denoise it through the global MLP (README.md:29); returns
      (num_images, H, W) in [0,1].
    * With ``model=(params, model_state)`` (a DDPM U-Net) or a checkpoint
      path: full ancestral sampling via one on-device lax.scan
      (src/generate_images.jl:231-245 semantics); returns (num_images, H, W)
      rescaled from [-1,1] to [0,1] when ``rescale``.
    """
    key = key if key is not None else jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**32))

    if model is None:
        outs = []
        for i in range(num_images):
            noise = jax.random.normal(jax.random.fold_in(key, i), image_size, jnp.float32)
            outs.append(denoise_image(noise, output_path=None))
        return np.stack(outs)

    if isinstance(model, (str, os.PathLike)):
        # any checkpoint (.npz or reference .bson): metadata-driven dispatch
        from igdm_tpu.sampling.auto import sample_from_checkpoint

        imgs01, _ = sample_from_checkpoint(str(model), key, num_images=num_images)
        return imgs01 if rescale else imgs01 * 2.0 - 1.0

    from igdm_tpu.sampling.ancestral import sample_ddpm

    params, model_state = model
    x = sample_ddpm(
        params,
        model_state,
        key,
        num_images=num_images,
        image_size=tuple(image_size),
        cfg=cfg or DiffusionConfig(),
    )
    x = np.asarray(x[..., 0])
    return (x + 1.0) / 2.0 if rescale else x


def generate_image_from_noise(*, params=None, key=None) -> np.ndarray:
    """randn(32,32) -> one-shot MLP denoise (the module's actual export,
    src/ImageGenerationDiffusionModels.jl:168-172)."""
    key = key if key is not None else jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**32))
    noise = jax.random.normal(key, (32, 32), jnp.float32)
    return denoise_image(noise, params=params)


def demo(output_dir: str = ".") -> dict:
    """The README-documented demo(): run everything except train
    (README.md:48-49 documents it; the reference never implemented it)."""
    grid = generate_grid(os.path.join(output_dir, "grid.png"))
    noisy = apply_noise(grid[:32, :32], output_path=os.path.join(output_dir, "noisy_img.png"))
    denoised = denoise_image(noisy, output_path=os.path.join(output_dir, "denoised_img.png"))
    generated = generate_image(num_images=1)
    return {"grid": grid, "noisy": noisy, "denoised": denoised, "generated": generated}
