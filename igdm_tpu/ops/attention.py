"""Spatial self-attention block for U-Net bottlenecks.

No attention exists anywhere in the reference (SURVEY.md section 5.7); this
is the standard DDPM bottleneck attention added for the 64x64 stretch
configs, where the 16x16 feature map benefits from global mixing. TPU-first:
the whole block is three matmuls + a softmax over HW tokens — MXU work with
XLA-fused softmax; at these sizes (<=1024 tokens) replication beats any
sequence sharding (SURVEY.md section 2.4: CP/ring-attention not required).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from igdm_tpu.ops.nn import group_norm


def init_attention(key, channels: int):
    k1, _ = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(channels)
    return {
        "norm": {
            "scale": jnp.ones((channels,), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32),
        },
        "qkv": {
            "w": jax.random.normal(k1, (channels, 3 * channels), jnp.float32) * scale,
            "b": jnp.zeros((3 * channels,), jnp.float32),
        },
        "proj": {
            # zero-init so the block starts as identity (residual-friendly)
            "w": jnp.zeros((channels, channels), jnp.float32),
            "b": jnp.zeros((channels,), jnp.float32),
        },
    }


def _flash_eligible(n_tokens: int, head_dim: int) -> bool:
    """The Pallas kernel needs lane-aligned tokens and a head dim that maps
    onto the 128-lane register file; the measured win starts at 1024 tokens
    (BASELINE.md round-3 flash table — below that, XLA's materialized
    softmax is already VMEM-resident and ties)."""
    return (
        n_tokens >= 1024
        # the kernel tiles N into block_q = block_k = 512 tiles
        # (flash_attention defaults) and _check_shapes hard-fails on a
        # remainder — mirror the REAL constraint here so auto-routing never
        # selects a config the kernel rejects (e.g. N=2304 at 48x48;
        # round-5 review)
        and n_tokens % 512 == 0
        and (head_dim <= 128 or head_dim % 128 == 0)
    )


def spatial_self_attention(params, x, *, heads: int = 4, groups: int = 8,
                           use_flash: bool | None = None):
    """Pre-norm residual self-attention over the spatial positions of
    (B, H, W, C); returns the same shape.

    use_flash: route the softmax-attention core through the Pallas
    FlashAttention kernel (`ops/pallas/flash_attention.py`). Default (None)
    auto-selects it on TPU for >= 1024 tokens, where it is measured
    1.2-3.2x faster than the XLA einsum path and never materializes the
    (N, N) logits (BASELINE.md round-3 flash table). False forces the XLA
    reference path.
    """
    b, h, w, c = x.shape
    hd = c // heads

    y = group_norm(x, params["norm"]["scale"], params["norm"]["bias"], groups=groups)
    tokens = y.reshape(b, h * w, c)
    qkv = jnp.einsum("bnc,cd->bnd", tokens, params["qkv"]["w"]) + params["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(b, h * w, heads, hd).transpose(0, 2, 1, 3)  # (B, Hd, N, hd)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu" and _flash_eligible(h * w, hd)
    if use_flash:
        from igdm_tpu.ops.pallas.flash_attention import flash_attention

        out = flash_attention(q, k, v, scale=float(1.0 / (hd**0.5)))
    else:
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits / jnp.sqrt(hd), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
    out = jnp.einsum("bnc,cd->bnd", out, params["proj"]["w"]) + params["proj"]["b"]
    return x + out.reshape(b, h, w, c)
