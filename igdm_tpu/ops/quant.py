"""Int8 quantized convolution for serving paths.

The v5e MXU runs int8 x int8 -> int32 at up to 2x the bf16 rate; measured
on this chip the framework's hot serving conv shapes gain +21% (pixel
sampler 256x32x32 64->64) and +57% (VAE decoder 1024x32x32 64->32) over
bf16 (probe: _scratch/int8_probe.py, 2026-08-21). The reference has no
quantization anywhere (its compute is f32 CPU BLAS,
/root/reference/src/train_brain.jl:36); this is a TPU-native serving
optimization beyond parity.

Scheme: symmetric per-output-channel weight quantization (static, folds
into XLA constants in the baked samplers) + symmetric per-tensor dynamic
activation quantization (one abs-max pass per call), int32 accumulation,
f32 dequantize fused into the epilogue. Downstream GroupNorm statistics
stay f32 (same mixed-precision recipe as the bf16 serving paths,
models/autoencoder.py::_conv_cd).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from igdm_tpu.ops.nn import DIMSPEC


def quantize_weight_int8(w):
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.

    Returns (wq int8 (kh, kw, cin, cout), scale f32 (cout,)). Inside a
    baked (weights-as-constants) jit, XLA constant-folds this whole
    function, so serving pays nothing for quantizing at trace time.
    """
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def conv2d_int8(x, wq, wscale, b=None, *, stride: int = 1, padding="SAME",
                xscale=None):
    """Int8 conv: quantize activations per-tensor, run the conv on the MXU
    in int8 with int32 accumulation, dequantize to f32.

    x: f32 NHWC; wq/wscale from quantize_weight_int8. xscale: optional
    STATIC activation scale (calibrated offline). When omitted, the scale
    is computed dynamically — one full abs-max pass over x per call, which
    measured as the difference between a win and a loss on the
    bandwidth-bound decode path (BASELINE.md round-5 int8 section): prefer
    calibrated scales in serving."""
    if xscale is None:
        amax = jnp.max(jnp.abs(x))
        xscale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / xscale), -127, 127).astype(jnp.int8)
    out = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=DIMSPEC,
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (xscale * wscale.reshape(1, 1, 1, -1))
    if b is not None:
        out = out + b.reshape(1, 1, 1, -1)
    return out


def conv2d_int8_from_f32(x, w, b=None, *, stride: int = 1, padding="SAME",
                         xscale=None):
    """Convenience wrapper: quantize the f32 kernel inline. Intended for
    baked samplers where `w` is a closure constant — XLA folds the weight
    quantization at compile time and only the activation quant + int8 conv
    remain in the serving program."""
    wq, wscale = quantize_weight_int8(w)
    return conv2d_int8(x, wq, wscale, b, stride=stride, padding=padding,
                       xscale=xscale)


def finalize_scales(amax: dict, *, headroom: float = 1.05) -> dict:
    """Turn a calibration's per-conv abs-max record into static activation
    scales: scale = amax * headroom / 127. Shared by every family's
    calibrator (flow / consistency / distilled) so a future change to the
    scale formula happens in exactly one place."""
    return {n: a * headroom / 127.0 for n, a in amax.items()}
