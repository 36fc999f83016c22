from igdm_tpu.sampling.ancestral import (
    sample_ddpm,
    sample_ddim,
    sample_dpmpp2m,
    sample_heun,
    sample_karras,
    sample_with_sigmas,
)
from igdm_tpu.sampling.edit import sample_inpaint

__all__ = [
    "sample_ddpm",
    "sample_ddim",
    "sample_dpmpp2m",
    "sample_heun",
    "sample_inpaint",
    "sample_karras",
    "sample_with_sigmas",
]
