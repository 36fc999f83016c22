from igdm_tpu.training.train_state import TrainState
from igdm_tpu.training.lr_schedules import warmup_cosine_lr
from igdm_tpu.training import (
    conditional,
    consistency,
    ddpm,
    distill,
    flow,
    latent,
    mlp_trainer,
    superres,
)

__all__ = [
    "TrainState", "warmup_cosine_lr", "conditional", "consistency", "ddpm",
    "distill", "flow", "latent", "mlp_trainer", "superres",
]
