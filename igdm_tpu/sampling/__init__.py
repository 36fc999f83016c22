from igdm_tpu.sampling.ancestral import (
    sample_ddpm,
    sample_ddim,
    sample_distilled,
    sample_dpmpp2m,
    sample_heun,
    sample_karras,
    sample_with_sigmas,
)
from igdm_tpu.sampling.consistency import sample_consistency
from igdm_tpu.sampling.edit import sample_inpaint
from igdm_tpu.sampling.flow import sample_flow
from igdm_tpu.sampling.guided import sample_cfg
from igdm_tpu.sampling.latent import make_latent_sampler, sample_latent
from igdm_tpu.sampling.superres import sample_superres

__all__ = [
    "make_latent_sampler",
    "sample_cfg",
    "sample_consistency",
    "sample_ddpm",
    "sample_ddim",
    "sample_distilled",
    "sample_dpmpp2m",
    "sample_flow",
    "sample_heun",
    "sample_latent",
    "sample_inpaint",
    "sample_karras",
    "sample_superres",
    "sample_with_sigmas",
]
