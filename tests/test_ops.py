"""Primitive op tests — the fast specializations must match lax exactly."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from igdm_tpu.ops.nn import (
    batch_norm,
    conv2d,
    conv_transpose2d,
    group_norm,
    max_pool_2x2,
    silu,
    upsample_bilinear_2x,
)


def test_conv_transpose_einsum_matches_lax():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 16))
    w = jax.random.normal(jax.random.fold_in(key, 1), (2, 2, 16, 8))
    got = conv_transpose2d(x, w, stride=2)
    want = lax.conv_transpose(
        x, w, strides=(2, 2), padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    assert got.shape == (2, 16, 16, 8)


def test_max_pool_matches_reduce_window():
    key = jax.random.PRNGKey(2)
    for shape in [(2, 8, 8, 4), (1, 7, 9, 3)]:  # odd sizes crop like VALID
        x = jax.random.normal(key, shape)
        got = max_pool_2x2(x)
        want = lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv2d_same_padding_shape():
    x = jnp.zeros((1, 32, 32, 3))
    w = jnp.zeros((3, 3, 3, 8))
    assert conv2d(x, w).shape == (1, 32, 32, 8)


def test_batch_norm_train_normalizes():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (8, 4, 4, 16)) * 3.0 + 2.0
    y, m, v = batch_norm(
        x, jnp.ones(16), jnp.zeros(16), jnp.zeros(16), jnp.ones(16), train=True
    )
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    # running stats moved toward batch stats
    assert np.all(np.asarray(m) > 0.1)


def test_batch_norm_eval_uses_running_stats():
    x = jnp.ones((2, 2, 2, 4)) * 5.0
    y, m, v = batch_norm(
        x, jnp.ones(4), jnp.zeros(4), jnp.full(4, 5.0), jnp.ones(4), train=False
    )
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(m), np.full(4, 5.0))


def test_group_norm_per_group_stats():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 8, 8, 16))
    y = group_norm(x, jnp.ones(16), jnp.zeros(16), groups=4)
    y = np.asarray(y).reshape(2, 8 * 8, 4, 4)
    np.testing.assert_allclose(y.mean(axis=(1, 3)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.reshape(2, -1, 4, 4).std(axis=(1, 3)), 1.0, atol=1e-3)


def test_upsample_bilinear_shape_and_constant():
    x = jnp.full((1, 4, 4, 2), 3.0)
    y = upsample_bilinear_2x(x)
    assert y.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(y), 3.0, rtol=1e-6)


def test_silu():
    np.testing.assert_allclose(float(silu(jnp.asarray(0.0))), 0.0)
    assert float(silu(jnp.asarray(10.0))) > 9.9


def test_pallas_groupnorm_silu_interpret_matches_reference():
    from igdm_tpu.ops.pallas.fused_groupnorm_silu import _reference, fused_groupnorm_silu

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 8, 8, 32))
    scale = jax.random.normal(jax.random.fold_in(key, 1), (32,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (32,)) * 0.1
    got = fused_groupnorm_silu(x, scale, bias, 8, 1e-5, True)  # interpret mode
    want = _reference(x, scale, bias, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pallas_groupnorm_silu_grad_matches_reference():
    from igdm_tpu.ops.pallas.fused_groupnorm_silu import _reference, fused_groupnorm_silu

    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (1, 4, 4, 16))
    scale = jnp.ones(16)
    bias = jnp.zeros(16)
    gp = jax.grad(lambda x: jnp.sum(fused_groupnorm_silu(x, scale, bias, 8, 1e-5, True) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(_reference(x, scale, bias, 8, 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-5)
