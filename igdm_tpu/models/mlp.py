"""One-shot MLP denoiser — the reference package's only *tested* model.

Chain(Dense(32*32, 128, relu), Dense(128, 32*32)) — 263,296 params
(src/ImageGenerationDiffusionModels.jl:14-17). The reference makes it a
module-level mutable global trained in-place by ``train_brain``; here it is a
pure params pytree (created by :func:`init`, threaded explicitly), with the
global-model convenience handled at the API layer.

Images are flattened column-major (Fortran order) to match the reference's
Julia ``reshape(mat, :, 1)`` semantics (src/ImageGenerationDiffusionModels.jl:91).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IN_DIM = 32 * 32
HIDDEN = 128


def _glorot_uniform(key, shape):
    fan_in, fan_out = shape[0], shape[1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init(key, in_dim: int = IN_DIM, hidden: int = HIDDEN):
    k1, k2 = jax.random.split(key)
    return {
        "dense1": {
            "w": _glorot_uniform(k1, (in_dim, hidden)),
            "b": jnp.zeros((hidden,), jnp.float32),
        },
        "dense2": {
            "w": _glorot_uniform(k2, (hidden, in_dim)),
            "b": jnp.zeros((in_dim,), jnp.float32),
        },
    }


def apply(params, x_flat):
    """Forward pass on (B, in_dim) batches (use :func:`flatten_image` first)."""
    h = jnp.dot(x_flat, params["dense1"]["w"], preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + params["dense1"]["b"])
    y = jnp.dot(h, params["dense2"]["w"], preferred_element_type=jnp.float32)
    return y + params["dense2"]["b"]


def flatten_image(img):
    """(H, W) -> (1, H*W) column-major, matching Julia reshape semantics."""
    img = jnp.asarray(img, jnp.float32)
    return img.T.reshape(1, -1)


def unflatten_image(vec, h: int = 32, w: int = 32):
    """(H*W,) or (1, H*W) -> (H, W), inverse of :func:`flatten_image`."""
    return jnp.asarray(vec).reshape(w, h).T


def num_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
