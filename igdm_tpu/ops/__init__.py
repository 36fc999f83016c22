from igdm_tpu.ops.nn import (
    conv2d,
    conv_transpose2d,
    max_pool_2x2,
    batch_norm,
    group_norm,
    upsample_bilinear_2x,
    silu,
)

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "max_pool_2x2",
    "batch_norm",
    "group_norm",
    "upsample_bilinear_2x",
    "silu",
]
