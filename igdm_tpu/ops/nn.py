"""NHWC neural-net primitives on top of lax.

Everything here is shape-static and jit-traceable; XLA maps the convs onto
the MXU and fuses the elementwise tails (norm affine + activation) into them.
The reference's compute bottoms out in NNlib CPU im2col convolutions
(SURVEY.md section 2.4); these are their TPU-native replacements.

Layout conventions: activations NHWC, conv kernels HWIO — the layouts the TPU
compiler tiles without transposes.
"""

from __future__ import annotations

from functools import partial

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


def conv_transpose2d(x, w, b=None, *, stride: int = 2, padding="VALID", preferred_dtype=None):
    """2-D transposed convolution (kernel HWIO, I=input channels of x).

    Semantics identical to ``lax.conv_transpose(transpose_kernel=False)``.
    For the kernel==stride case (the U-Net's ConvT 2x2/stride-2,
    src/train_brain.jl:130) the windows don't overlap, so the op is a single
    einsum + pixel-shuffle reshape — one MXU matmul instead of an
    input-dilated conv (which XLA:CPU executes pathologically slowly, and
    which the TPU compiler also tiles worse).

    preferred_dtype: einsum output dtype (default f32). The bf16 serving
    path passes bf16 — the f32 default materialized a 67 MB f32
    pixel-shuffle intermediate + layout transpose, measured ~180 us/step of
    the sampler's 1,255 (BASELINE.md round-3 roofline).
    """
    kh, kw, cin, cout = w.shape
    if (kh, kw) == (stride, stride) and padding == "VALID":
        n, h, wd, _ = x.shape
        # lax.conv_transpose correlates the dilated input with w, which lands
        # kernel tap (kh-1-a, kw-1-b) on output offset (a, b): use w reversed.
        wr = w[::-1, ::-1, :, :]
        out = jnp.einsum(
            "nhwc,abco->nhawbo", x, wr,
            preferred_element_type=preferred_dtype or jnp.float32,
        )
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


def _bn_relu_fwd_math(x, scale, bias, eps, axis_name):
    """One-pass statistics + normalize + ReLU. Returns f32 intermediates."""
    n = x.shape[0] * x.shape[1] * x.shape[2]
    xf = x.astype(jnp.float32)
    # single multi-output reduction: one read of x yields both moments
    s1 = jnp.sum(xf, axis=(0, 1, 2))
    s2 = jnp.sum(xf * xf, axis=(0, 1, 2))
    if axis_name is not None:
        s1 = lax.psum(s1, axis_name)
        s2 = lax.psum(s2, axis_name)
        n = n * lax.psum(1, axis_name)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = lax.rsqrt(var + eps)
    x_hat = (xf - mean) * inv
    z = x_hat * scale + bias
    y = jnp.maximum(z, 0.0).astype(x.dtype)
    return y, mean, var, x_hat, inv, n


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bn_relu_core(x, scale, bias, eps, axis_name):
    y, mean, var, _, _, _ = _bn_relu_fwd_math(x, scale, bias, eps, axis_name)
    return y, mean, var


def _bn_relu_core_fwd(x, scale, bias, eps, axis_name):
    y, mean, var, x_hat, inv, n = _bn_relu_fwd_math(x, scale, bias, eps, axis_name)
    # bf16 x_hat halves the backward's HBM traffic; |x_hat| is O(1) so the
    # rounding perturbs gradients by ~0.5% (test-bounded)
    return (y, mean, var), (x_hat.astype(jnp.bfloat16), inv, scale, bias, n)


def _bn_relu_core_bwd(eps, axis_name, res, cts):
    dy, _, _ = cts  # mean/var feed undifferentiated running-stat state
    x_hat_b, inv, scale, bias, n = res
    x_hat = x_hat_b.astype(jnp.float32)
    z_pos = (x_hat * scale + bias) > 0
    dz = jnp.where(z_pos, dy.astype(jnp.float32), 0.0)
    dbeta = jnp.sum(dz, axis=(0, 1, 2))
    dgamma = jnp.sum(dz * x_hat, axis=(0, 1, 2))
    # dx needs GLOBAL reduction terms under axis_name (n is the global
    # count), but the returned parameter grads stay LOCAL sums — the same
    # convention autodiff of the unfused path yields, so callers that
    # psum/pmean their grad tree treat both paths identically.
    dbeta_g, dgamma_g = dbeta, dgamma
    if axis_name is not None:
        dbeta_g = lax.psum(dbeta, axis_name)
        dgamma_g = lax.psum(dgamma, axis_name)
    k = scale * inv
    dx = (k * (dz - dbeta_g / n - x_hat * (dgamma_g / n))).astype(dy.dtype)
    return dx, dgamma, dbeta


_bn_relu_core.defvjp(_bn_relu_core_fwd, _bn_relu_core_bwd)


def batch_norm_relu_train(
    x,
    scale,
    bias,
    running_mean,
    running_var,
    *,
    conv_bias=None,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: str | None = None,
):
    """Fused train-mode BatchNorm+ReLU with a hand-derived minimal-pass VJP.

    The production training block for the mixed-precision path. Differences
    from composing ``batch_norm(train=True)`` + ``relu`` (all measured on the
    v5e chip, BASELINE.md round-2 roofline):

    * **One-pass statistics**: mean and variance come from a single
      multi-output reduction (E[x], E[x^2]) over the *raw conv output* —
      bf16 in mixed precision, so the statistics pass reads half the bytes
      and runs once instead of twice. Accumulation is f32.
    * **Bias invariance**: train-mode BatchNorm is shift-invariant, so the
      conv bias never needs to be added to the activations at all — pass it
      as ``conv_bias`` and it only shifts the recorded running mean
      (``BN(x+b) == BN(x)`` exactly; d(loss)/d(conv_bias) == 0 exactly,
      which autodiff of the unfused path only approximates with float
      noise). This deletes a full elementwise pass and its backward chain.
    * **Minimal-pass backward**: the hand-derived VJP recomputes the ReLU
      mask from a bf16 ``x_hat`` residual and produces
      ``dx = (scale*inv) * (dz - mean(dz) - x_hat*mean(dz*x_hat))`` in two
      fused passes (one multi-output reduction + one elementwise), versus
      the longer autodiff chain through the two-pass variance.
    * ``y`` keeps ``x.dtype`` (bf16 in mixed precision), so downstream
      convs and the returning cotangents stay bf16.

    Under ``shard_map``/``pmap`` pass ``axis_name`` to make the statistics
    (forward) and the dx reduction terms (backward) global, matching
    ``batch_norm``'s cross-replica semantics. The returned ``scale``/``bias``
    grads stay LOCAL sums — the same convention autodiff of the unfused
    path yields — so combine the grad tree (psum/pmean) once, uniformly.
    Under plain jit+sharding the reductions are already global and XLA
    inserts the collectives.

    Gradients do NOT flow through the returned running statistics (they are
    optimizer-invisible aux state everywhere in this framework, matching
    the reference where Flux's running stats are `@nograd`).

    Returns ``(y, new_running_mean, new_running_var)`` like ``batch_norm``.
    """
    y, mean, var = _bn_relu_core(x, scale, bias, eps, axis_name)
    mean = lax.stop_gradient(mean)
    var = lax.stop_gradient(var)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    if axis_name is not None:
        n = n * lax.psum(1, axis_name)
    stats_mean = mean if conv_bias is None else mean + lax.stop_gradient(conv_bias)
    unbiased = var * (n / jnp.maximum(n - 1, 1))
    new_mean = (1.0 - momentum) * running_mean + momentum * stats_mean
    new_var = (1.0 - momentum) * running_var + momentum * unbiased
    return y, new_mean, new_var


def _gn_silu_fwd_math(x, scale, bias, conv_bias, groups, eps):
    n_, h_, w_, c = x.shape
    cs = c // groups
    xf = x.astype(jnp.float32) + conv_bias
    g = xf.reshape(n_, h_, w_, groups, cs)
    cnt = h_ * w_ * cs
    # one multi-output reduction yields both moments per (sample, group)
    s1 = jnp.sum(g, axis=(1, 2, 4))
    s2 = jnp.sum(g * g, axis=(1, 2, 4))
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    inv = lax.rsqrt(var + eps)  # (N, G)
    x_hat = ((g - mean[:, None, None, :, None]) * inv[:, None, None, :, None]).reshape(
        n_, h_, w_, c
    )
    z = x_hat * scale + bias
    y = (z * jax.nn.sigmoid(z)).astype(x.dtype)
    return y, x_hat, inv


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gn_silu_core(x, scale, bias, conv_bias, groups, eps):
    y, _, _ = _gn_silu_fwd_math(x, scale, bias, conv_bias, groups, eps)
    return y


def _gn_silu_core_fwd(x, scale, bias, conv_bias, groups, eps):
    y, x_hat, inv = _gn_silu_fwd_math(x, scale, bias, conv_bias, groups, eps)
    return y, (x_hat.astype(jnp.bfloat16), inv, scale, bias)


def _gn_silu_core_bwd(groups, eps, res, dy):
    x_hat_b, inv, scale, bias = res
    n_, h_, w_, c = dy.shape
    cs = c // groups
    cnt = h_ * w_ * cs
    x_hat = x_hat_b.astype(jnp.float32)
    z = x_hat * scale + bias
    sig = jax.nn.sigmoid(z)
    dz = dy.astype(jnp.float32) * (sig * (1.0 + z * (1.0 - sig)))
    dgamma = jnp.sum(dz * x_hat, axis=(0, 1, 2))
    dbeta = jnp.sum(dz, axis=(0, 1, 2))
    dxh = (dz * scale).reshape(n_, h_, w_, groups, cs)
    xg = x_hat.reshape(n_, h_, w_, groups, cs)
    r1 = jnp.sum(dxh, axis=(1, 2, 4)) / cnt  # (N, G)
    r2 = jnp.sum(dxh * xg, axis=(1, 2, 4)) / cnt
    dx = (
        inv[:, None, None, :, None]
        * (dxh - r1[:, None, None, :, None] - xg * r2[:, None, None, :, None])
    ).reshape(n_, h_, w_, c)
    dconv_bias = jnp.sum(dx, axis=(0, 1, 2))
    return dx.astype(dy.dtype), dgamma, dbeta, dconv_bias


_gn_silu_core.defvjp(_gn_silu_core_fwd, _gn_silu_core_bwd)


def group_norm_silu_train(
    x, scale, bias, *, conv_bias=None, groups: int = 8, eps: float = 1e-5
):
    """Fused GroupNorm+SiLU with a hand-derived minimal-pass VJP — the
    mixed-precision training block for the 4-level U-Net family
    (Conv -> GroupNorm -> swish, last_desperate_attempt/src/shared.jl:193-198).

    Mirrors ``batch_norm_relu_train``: one-pass f32 statistics computed
    directly over the raw (bf16) conv output, backward from a bf16
    ``x_hat`` residual in two fused passes, activations and cotangents in
    ``x.dtype`` end to end. Unlike train-mode BatchNorm, GroupNorm is NOT
    shift-invariant to a per-channel bias (the bias varies within a group),
    so ``conv_bias`` participates in the statistics and gets an exact
    gradient (``d(conv_bias) = sum of dx over (N,H,W)`` since the bias
    enters additively like ``x``).

    Returns ``y`` with ``x.dtype``.
    """
    if conv_bias is None:
        conv_bias = jnp.zeros_like(scale)
    return _gn_silu_core(x, scale, bias, conv_bias, groups, eps)


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
