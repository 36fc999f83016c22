from igdm_tpu.diffusion.schedules import (
    linear_beta_schedule,
    alphas_cumprod,
    karras_sigma_schedule,
    reference_noise_schedule,
)
from igdm_tpu.diffusion.processes import (
    q_sample,
    apply_noise_coeffs,
    apply_noise_transform,
    reverse_diffusion_step,
    ddim_step,
)

__all__ = [
    "linear_beta_schedule",
    "alphas_cumprod",
    "karras_sigma_schedule",
    "reference_noise_schedule",
    "q_sample",
    "apply_noise_coeffs",
    "apply_noise_transform",
    "reverse_diffusion_step",
    "ddim_step",
]
