"""Learning-rate schedules.

``warmup_cosine_lr`` reproduces the reference's epoch-level get_lr
(last_desperate_attempt/src/train_net.jl:57-68): linear warmup for
``warmup_epochs``, constant plateau until 3*warmup_epochs, then cosine decay
from lr_start to lr_min — with its exact (slightly odd) cosine phase
t = (ep - warmup)/(epochs - warmup).
"""

from __future__ import annotations

import math


def warmup_cosine_lr(
    epoch: int,
    *,
    lr_start: float = 3e-3,
    lr_min: float = 1e-6,
    warmup_epochs: int = 9,
    total_epochs: int = 100,
) -> float:
    if warmup_epochs > 0 and epoch <= warmup_epochs:
        return lr_start * epoch / warmup_epochs
    if epoch <= 3 * warmup_epochs:
        return lr_start
    t = (epoch - warmup_epochs) / (total_epochs - warmup_epochs)
    cosine = 0.5 * (1.0 + math.cos(math.pi * t))
    return lr_min + (lr_start - lr_min) * cosine
