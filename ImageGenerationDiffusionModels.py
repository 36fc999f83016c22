"""Drop-in compatibility shim: `import ImageGenerationDiffusionModels`.

Users of the Julia package can keep their mental model — this module
re-exports the igdm_tpu public API under the reference's module name
(src/ImageGenerationDiffusionModels.jl:351 exports; README.md:14-29
documented surface).

    import ImageGenerationDiffusionModels as IGDM
    IGDM.generate_grid()
    IGDM.apply_noise(img)
    IGDM.train_brain(100)
    IGDM.denoise_image(noisy)
    IGDM.generate_image_from_noise()
"""

from igdm_tpu import (  # noqa: F401
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
    "generate_grid",
    "apply_noise",
    "train",
    "train_brain",
    "denoise_image",
    "generate_image",
    "generate_image_from_noise",
    "sinusoidal_embedding",
    "demo",
]
