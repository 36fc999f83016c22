"""NHWC neural-net primitives on top of lax.

Everything here is shape-static and jit-traceable; XLA maps the convs onto
the MXU and fuses the elementwise tails (norm affine + activation) into them.
The reference's compute bottoms out in NNlib CPU im2col convolutions
(SURVEY.md section 2.4); these are their TPU-native replacements.

Layout conventions: activations NHWC, conv kernels HWIO — the layouts the TPU
compiler tiles without transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b=None, *, stride: int = 1, padding="SAME"):
    """2-D convolution (cross-correlation, XLA-native orientation)."""
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=DIMSPEC,
    )
    if b is not None:
        out = out + b.reshape(1, 1, 1, -1)
    return out


def conv_transpose2d(x, w, b=None, *, stride: int = 2, padding="VALID"):
    """2-D transposed convolution (kernel HWIO, I=input channels of x).

    Semantics identical to ``lax.conv_transpose(transpose_kernel=False)``.
    For the kernel==stride case (the U-Net's ConvT 2x2/stride-2,
    src/train_brain.jl:130) the windows don't overlap, so the op is a single
    einsum + pixel-shuffle reshape — one MXU matmul instead of an
    input-dilated conv (which XLA:CPU executes pathologically slowly, and
    which the TPU compiler also tiles worse).
    """
    kh, kw, cin, cout = w.shape
    if (kh, kw) == (stride, stride) and padding == "VALID":
        n, h, wd, _ = x.shape
        # lax.conv_transpose correlates the dilated input with w, which lands
        # kernel tap (kh-1-a, kw-1-b) on output offset (a, b): use w reversed.
        wr = w[::-1, ::-1, :, :]
        out = jnp.einsum("nhwc,abco->nhawbo", x, wr, preferred_element_type=jnp.float32)
        out = out.reshape(n, h * stride, wd * stride, cout)
    else:
        out = lax.conv_transpose(
            x,
            w,
            strides=(stride, stride),
            padding=padding,
            dimension_numbers=DIMSPEC,
        )
    if b is not None:
        out = out + b.reshape(1, 1, 1, -1)
    return out


def max_pool_2x2(x):
    """2x2/stride-2 max pool (reference: MaxPool((2,2)), src/train_brain.jl:117).

    Implemented as a reshape+max (identical to VALID reduce_window for this
    window; odd trailing rows/cols are cropped exactly as VALID does) — it
    fuses better than reduce_window and its gradient is a cheap scatter-free
    select on both CPU and TPU.
    """
    n, h, w, c = x.shape
    x = x[:, : (h // 2) * 2, : (w // 2) * 2, :]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


def batch_norm(
    x,
    scale,
    bias,
    running_mean,
    running_var,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: str | None = None,
):
    """BatchNorm over (N,H,W) per channel, Flux-compatible semantics.

    Flux BatchNorm (used throughout the reference SimpleUNet,
    src/train_brain.jl:112-141): train mode normalizes by batch statistics and
    updates running stats with ``(1-m)*old + m*new`` (m=0.1, unbiased var for
    the running update); eval mode uses running stats.

    Under data parallelism, pass ``axis_name`` to average the batch statistics
    across the mesh with ``lax.pmean`` so every replica normalizes identically.

    Returns (y, new_running_mean, new_running_var).
    """
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x - mean.reshape(1, 1, 1, -1)), axis=(0, 1, 2))
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            var = lax.pmean(var, axis_name)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_mean = (1.0 - momentum) * running_mean + momentum * mean
        new_var = (1.0 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    inv = lax.rsqrt(var + eps)
    y = (x - mean.reshape(1, 1, 1, -1)) * (scale * inv).reshape(1, 1, 1, -1)
    y = y + bias.reshape(1, 1, 1, -1)
    return y, new_mean, new_var


def group_norm(x, scale, bias, *, groups: int = 8, eps: float = 1e-5):
    """GroupNorm over channel groups (reference: Flux.GroupNorm(C, 8),
    last_desperate_attempt/src/shared.jl:195). Stateless — the norm of choice
    for data-parallel TPU training (no cross-replica stats)."""
    n, h, w, c = x.shape
    g = x.reshape(n, h, w, groups, c // groups)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * lax.rsqrt(var + eps)
    y = g.reshape(n, h, w, c)
    return y * scale.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1)


def upsample_bilinear_2x(x):
    """2x bilinear upsample, align_corners=False (Flux Upsample(:bilinear),
    last_desperate_attempt/src/shared.jl:235)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


def silu(x):
    """swish/SiLU (last_desperate_attempt/src/shared.jl:196)."""
    return x * jax.nn.sigmoid(x)
