"""Frozen configuration objects.

The reference has no config system — hyperparameters live in duplicated
``const`` blocks that have drifted between train and sample scripts
(reference: T=5 at src/train_brain.jl:18 vs comment "500"; sample T=750 vs
train T=150 in last_desperate_attempt; base_ch 64 vs 80 mismatch,
last_desperate_attempt/src/sample.jl:93 vs train_net.jl:188).

Here a single frozen dataclass travels with every checkpoint so the training
and sampling configurations can never drift.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class DiffusionConfig:
    """Linear-beta DDPM schedule (reference: src/train_brain.jl:17-24)."""

    num_steps: int = 500  # T ("500" is the documented intent; ref committed T=5)
    beta_min: float = 1e-4
    beta_max: float = 0.02
    embed_dim: int = 128  # D, sinusoidal timestep embedding width
    schedule: str = "linear"  # "linear" (reference) | "cosine" (improved DDPM)


@dataclass(frozen=True)
class KarrasConfig:
    """Karras rho-schedule (reference: last_desperate_attempt/src/sample.jl:41-57)."""

    num_steps: int = 750
    sigma_min: float = 1e-5
    sigma_max: float = 1.0
    rho: float = 7.0


@dataclass(frozen=True)
class UNetConfig:
    """2-level SimpleUNet topology (reference: src/train_brain.jl:109-145)."""

    channels: int = 1
    base_width: int = 64
    embed_dim: int = 128
    norm: str = "batch"  # "batch" matches the reference; "group" is the modern variant


@dataclass(frozen=True)
class UNet4Config:
    """4-level GroupNorm+SiLU U-Net (reference: last_desperate_attempt/src/shared.jl:188-278)."""

    in_channels: int = 1
    base_ch: int = 64
    time_dim: int = 128
    groups: int = 8


@dataclass(frozen=True)
class TrainConfig:
    """DDPM training loop settings (reference: src/train_brain.jl:26-31)."""

    batch_size: int = 64
    epochs: int = 100
    lr: float = 2e-4
    patience: int = 10
    min_delta: float = 1e-3
    checkpoint_every: int = 5
    seed: int = 0
    # AdamW + warmup/cosine options (last_desperate_attempt/src/train_net.jl:31-34,57-68)
    optimizer: str = "adam"  # "adam" | "adamw"
    weight_decay: float = 0.0
    warmup_epochs: int = 0
    lr_min: float = 1e-6
    # exponential moving average of weights for sampling (standard DDPM
    # practice; absent in the reference). 0 disables; 0.999 typical.
    ema_decay: float = 0.0
    # training objective: "eps" (reference parity, Ho et al.) or "v"
    # (v-prediction, Salimans & Ho 2022: v = alpha*eps - sigma*x0 — better
    # conditioned at extreme timesteps and the standard target for few-step
    # samplers/distillation). Serialized into checkpoints; sampling.auto
    # converts v-predictions back to eps transparently.
    objective: str = "eps"
    # epochs executed inside ONE jitted dispatch (lax.scan over epochs).
    # Bit-identical numbers to 1 (per-epoch RNG derives from the step
    # counter); >1 amortizes the host->device round-trip for small datasets
    # (the reference's 500-image set = 8 batches/epoch). Early stopping and
    # checkpoints are evaluated per epoch but effected at block boundaries.
    epochs_per_dispatch: int = 1
    # conv compute dtype: "float32" (bit-exact, default) or "bfloat16"
    # (mixed precision: convs + their backward matmuls at the MXU bf16 rate,
    # f32 master params and BatchNorm statistics — measured ~1.7x faster
    # train step on v5e).
    compute_dtype: str = "float32"


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), sort_keys=True)


def config_from_dict(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})
