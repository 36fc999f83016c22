"""Noise schedules.

Pure functions returning small 1-D arrays. Computed in float64 on host (numpy)
for accuracy — the cumulative products underflow-sensitive — then cast to
float32 once; on device they live in SMEM-friendly constant buffers that XLA
folds into the compiled program.

Reference:
  * linear beta schedule + alpha-bar: src/train_brain.jl:20-24
  * sigma schedule sqrt(1-alpha_bar): last_desperate_attempt/src/train_net.jl:37-41
  * Karras rho-schedule: last_desperate_attempt/src/sample.jl:45-57
"""

from __future__ import annotations

import numpy as np


def linear_beta_schedule(num_steps: int, beta_min: float = 1e-4, beta_max: float = 0.02) -> np.ndarray:
    """T evenly spaced betas, endpoints inclusive (Julia ``range(len=T)``)."""
    return np.linspace(beta_min, beta_max, num_steps, dtype=np.float64)


def alphas_cumprod(betas: np.ndarray) -> np.ndarray:
    """alpha_bar_t = prod_{s<=t} (1 - beta_s) (src/train_brain.jl:23-24)."""
    return np.cumprod(1.0 - np.asarray(betas, dtype=np.float64))


def sigma_from_alpha_bar(alpha_bar: np.ndarray) -> np.ndarray:
    """sigma_t = sqrt(1 - alpha_bar_t) (train_net.jl:41)."""
    return np.sqrt(1.0 - np.asarray(alpha_bar, dtype=np.float64))


def betas_for_config(cfg) -> np.ndarray:
    """Betas for a DiffusionConfig: linear (reference) or cosine."""
    if getattr(cfg, "schedule", "linear") == "cosine":
        return cosine_beta_schedule(cfg.num_steps)
    return linear_beta_schedule(cfg.num_steps, cfg.beta_min, cfg.beta_max)


def reference_noise_schedule(
    num_noise_steps: int = 500, beta_min: float = 1e-4, beta_max: float = 0.02
) -> np.ndarray:
    """The package's ``apply_noise`` schedule — N+1 betas.

    The reference builds ``beta_min:(beta_max-beta_min)/N:beta_max`` — a Julia
    step-range whose step divides by N, yielding N+1 values including both
    endpoints (src/ImageGenerationDiffusionModels.jl:62). Reproduced exactly:
    the committed MLP behavior depends on it.
    """
    step = (beta_max - beta_min) / num_noise_steps
    # Julia StepRangeLen includes every k with beta_min + k*step <= beta_max.
    n = int(np.floor((beta_max - beta_min) / step + 1e-9)) + 1
    return beta_min + step * np.arange(n, dtype=np.float64)


def cosine_beta_schedule(num_steps: int, s: float = 0.008, max_beta: float = 0.999) -> np.ndarray:
    """Cosine schedule (Nickel & Dhariwal, "Improved DDPM", arXiv:2102.09672)
    — listed in PAPERS.md; not present in the reference. Much better SNR
    distribution than linear betas for image DDPMs."""
    t = np.arange(num_steps + 1, dtype=np.float64) / num_steps
    f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
    alpha_bar = f / f[0]
    betas = 1.0 - alpha_bar[1:] / alpha_bar[:-1]
    return np.clip(betas, 0.0, max_beta)


def karras_sigma_schedule(
    sigma_min: float = 1e-5,
    sigma_max: float = 1.0,
    rho: float = 7.0,
    num_steps: int = 750,
) -> np.ndarray:
    """Karras-style rho-interpolated sigma schedule of length ``num_steps``.

    Matches last_desperate_attempt/src/sample.jl:45-57 exactly, including its
    quirks: sigma[0] = 0, interpolation over N = max(num_steps-1, 3) interior
    points in sigma^(-1/rho) space, clamp at 1, then truncation to num_steps.
    """
    n_interior = max(num_steps - 1, 3)
    inv_rho = 1.0 / rho
    a = sigma_min ** (-inv_rho)
    b = sigma_max ** (-inv_rho)
    sig = np.zeros(n_interior + 1, dtype=np.float64)
    i = np.arange(2, n_interior + 2, dtype=np.float64)
    t = (i - 2.0) / (n_interior - 1.0)
    sig[1:] = np.minimum((a + t * (b - a)) ** (-rho), 1.0)
    return sig[:num_steps]


def strided_ddim_grid(num_steps: int, num_sample_steps: int):
    """Shared strided sampling grid: unique rounded ``linspace(1, T, n)``
    descending, plus the shifted-previous array terminated by 0 (which every
    consumer maps to "alpha_bar_prev = 1 / sigma = 0").

    One definition for the six DDIM-family samplers (ddim, dpm++2m, heun,
    CFG, superres, latent) — a rounding/endpoint change here reaches all of
    them at once instead of drifting per-file (round-5 review).
    Returns (ts, ts_prev) int32 ndarrays.
    """
    import numpy as _np

    ts = _np.unique(
        _np.linspace(1, num_steps, num_sample_steps).round().astype(_np.int32)
    )[::-1]
    return ts, _np.concatenate([ts[1:], [0]]).astype(_np.int32)
