"""Pallas TPU kernel: fused GroupNorm + SiLU.

The conv blocks of the 4-level U-Net are Conv -> GroupNorm -> SiLU twice per
level (reference: last_desperate_attempt/src/shared.jl:193-198). Unfused,
GroupNorm costs two reduction passes plus an elementwise chain, each a
round-trip through HBM. This kernel keeps one batch element's full (H*W, C)
feature map in VMEM and does statistics + normalize + affine + SiLU in a
single pass — one HBM read, one HBM write, all VPU work.

Grid: one program per batch element. Feature maps at every U-Net level fit
VMEM comfortably (worst case here: 32*32 x 240ch fp32 < 1 MB of 16 MB/core).

Backward uses jax.custom_vjp with an XLA-fused reference VJP — correctness
first; a hand-written backward kernel is a later optimization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from igdm_tpu.ops.nn import group_norm, silu


def _reference(x, scale, bias, groups, eps):
    return silu(group_norm(x, scale, bias, groups=groups, eps=eps))


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, out_ref, *, groups: int, eps: float):
    # x_ref block: (1, HW, C). One pass: column sums -> tiny per-group stats ->
    # per-channel affine vectors -> single vectorized normalize+SiLU. No
    # slicing or concatenation of the big tensor.
    x = x_ref[0]  # (HW, C)
    hw, c = x.shape
    cs = c // groups
    n_per_group = hw * cs

    colsum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    colsumsq = jnp.sum(x * x, axis=0, keepdims=True)  # (1, C)
    # group-reduce via a static one-hot (C, G) matmul — Mosaic does not
    # support reshaping the lane dimension of small vectors
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cs
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (ch_group == gid).astype(jnp.float32)  # (C, G)
    gsum = jnp.dot(colsum, onehot, preferred_element_type=jnp.float32)  # (1, G)
    gsumsq = jnp.dot(colsumsq, onehot, preferred_element_type=jnp.float32)
    mean_g = gsum / n_per_group
    var_g = gsumsq / n_per_group - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)  # (1, G)

    # scatter per-group stats back to per-channel (1, C) vectors
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, onehot.T, preferred_element_type=jnp.float32)

    a = inv_c * scale_ref[:].reshape(1, c)
    b = bias_ref[:].reshape(1, c) - mean_c * a
    z = x * a + b
    out_ref[0] = z * jax.nn.sigmoid(z)


def _pallas_forward(x, scale, bias, *, groups: int, eps: float, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    hw = h * w
    x2 = x.reshape(n, hw, c)
    out = pl.pallas_call(
        partial(_gn_silu_kernel, groups=groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale, bias)
    return out.reshape(n, h, w, c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_groupnorm_silu(x, scale, bias, groups: int = 8, eps: float = 1e-5, interpret: bool = False):
    """silu(group_norm(x, scale, bias)) as one fused TPU kernel.

    Args:
      x: (N, H, W, C) activations, C divisible by groups.
      interpret: run the Pallas interpreter (for CPU tests).
    """
    return _pallas_forward(x, scale, bias, groups=groups, eps=eps, interpret=interpret)


def _fwd(x, scale, bias, groups, eps, interpret):
    out = _pallas_forward(x, scale, bias, groups=groups, eps=eps, interpret=interpret)
    return out, (x, scale, bias)


def _bwd(groups, eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _reference(x, s, b, groups, eps), x, scale, bias)
    return vjp(g)


fused_groupnorm_silu.defvjp(_fwd, _bwd)


def groupnorm_silu(x, scale, bias, *, groups: int = 8, eps: float = 1e-5, use_pallas: bool | None = None):
    """Dispatcher between the Pallas kernel and the XLA reference.

    Measured on v5e (round 2, scan-repetition methodology, BASELINE.md):
    STANDALONE the kernel beats XLA 2x at deep-bottleneck shapes
    ((64,8,8,512): 48.5 vs 99.6 us) and ties or wins slightly at
    (16,32,32,64)/(16,16,16,512), but loses 2x at wide spatial shapes
    ((32,64,64,64): 271 vs 127 us — one grid program per batch element is
    the wrong decomposition there). IN-MODEL it loses at every tested unet4
    config (base 32/64 @64x64 fwd+bwd: +35%/+22%) because XLA fuses the
    GN+SiLU chain into the conv epilogue and the custom call blocks that
    fusion. Default is therefore XLA; opt in with use_pallas=True or
    IGDM_USE_PALLAS_GN=1.
    """
    if use_pallas is None:
        import os

        use_pallas = (
            os.environ.get("IGDM_USE_PALLAS_GN") == "1" and jax.default_backend() == "tpu"
        )
    if use_pallas and x.shape[-1] % groups == 0:
        return fused_groupnorm_silu(x, scale, bias, groups, eps)
    return _reference(x, scale, bias, groups, eps)
