"""igdm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) diffusion-model framework.

A ground-up rebuild of the capability set of
``paul-vdl/ImageGenerationDiffusionModels.jl`` (reference mounted at
``/root/reference``), designed TPU-first:

* forward noising is a closed-form, jit-fused transform
  (reference: sequential loop at src/ImageGenerationDiffusionModels.jl:60-73),
* DDPM training is a single jitted ``value_and_grad`` + optax step with a
  data-parallel mesh (reference: per-batch Zygote loop, src/train_brain.jl:246-304),
* ancestral sampling runs as one ``lax.scan`` over all T steps on device
  (reference: host-side Julia loop, src/generate_images.jl:231-245),
* checkpoints are flat JAX pytrees with full training state, plus a BSON
  importer for the reference's committed checkpoints.

Public API mirrors the reference README (README.md:14-29): ``generate_grid``,
``apply_noise``, ``train``, ``denoise_image``, ``generate_image`` — with the
module's actually-exported names (``train_brain``,
``generate_image_from_noise``; src/ImageGenerationDiffusionModels.jl:351) kept
as compatibility aliases, and ``demo()`` (documented but never implemented in
the reference) implemented for real.
"""

__version__ = "0.4.0"  # keep in sync with pyproject.toml and CHANGELOG.md

from igdm_tpu.api import (
    apply_noise,
    demo,
    denoise_image,
    generate_grid,
    generate_image,
    generate_image_from_noise,
    sinusoidal_embedding,
    train,
    train_brain,
)

__all__ = [
    "apply_noise",
    "demo",
    "denoise_image",
    "generate_grid",
    "generate_image",
    "generate_image_from_noise",
    "sinusoidal_embedding",
    "train",
    "train_brain",
    "__version__",
]
