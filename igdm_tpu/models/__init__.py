from igdm_tpu.models.embeddings import sinusoidal_embedding, timestep_embedding
from igdm_tpu.models import mlp, unet_small, unet4

__all__ = ["sinusoidal_embedding", "timestep_embedding", "mlp", "unet_small", "unet4"]
