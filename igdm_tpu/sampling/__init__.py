from igdm_tpu.sampling.ancestral import (
    sample_ddpm,
    sample_ddim,
    sample_dpmpp2m,
    sample_karras,
    sample_with_sigmas,
)

__all__ = [
    "sample_ddpm",
    "sample_ddim",
    "sample_dpmpp2m",
    "sample_karras",
    "sample_with_sigmas",
]
