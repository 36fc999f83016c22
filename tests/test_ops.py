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


def _bn_relu_composition(x, scale, bias, rm, rv, conv_bias):
    y, m, v = batch_norm(
        x + conv_bias.reshape(1, 1, 1, -1), scale, bias, rm, rv, train=True
    )
    return jax.nn.relu(y), m, v


def _bn_relu_fixture(c=16, seed=7):
    key = jax.random.PRNGKey(seed)
    ks = [jax.random.fold_in(key, i) for i in range(6)]
    x = jax.random.normal(ks[0], (4, 8, 8, c)) * 2.0 + 0.5
    conv_bias = jax.random.normal(ks[1], (c,)) * 0.5
    scale = 1.0 + 0.1 * jax.random.normal(ks[2], (c,))
    bias = 0.1 * jax.random.normal(ks[3], (c,))
    rm = 0.1 * jax.random.normal(ks[4], (c,))
    rv = 1.0 + 0.1 * jax.random.uniform(ks[5], (c,))
    return x, scale, bias, rm, rv, conv_bias


def test_batch_norm_relu_train_matches_composition():
    """Fused train-mode BN+ReLU == conv-bias-add -> batch_norm -> relu
    (forward outputs AND running statistics), despite never adding the
    bias to the activations (train-mode BN is shift-invariant)."""
    from igdm_tpu.ops.nn import batch_norm_relu_train

    x, scale, bias, rm, rv, conv_bias = _bn_relu_fixture()
    want_y, want_m, want_v = _bn_relu_composition(x, scale, bias, rm, rv, conv_bias)
    got_y, got_m, got_v = batch_norm_relu_train(
        x, scale, bias, rm, rv, conv_bias=conv_bias
    )
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-4, atol=1e-6)


def test_batch_norm_relu_train_bias_invariance():
    """y is bitwise independent of conv_bias; only the running mean moves
    (by momentum * delta), and d(loss)/d(conv_bias) is exactly zero."""
    from igdm_tpu.ops.nn import batch_norm_relu_train

    x, scale, bias, rm, rv, conv_bias = _bn_relu_fixture(seed=8)
    y1, m1, _ = batch_norm_relu_train(x, scale, bias, rm, rv, conv_bias=conv_bias)
    y2, m2, _ = batch_norm_relu_train(x, scale, bias, rm, rv, conv_bias=conv_bias + 7.0)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_allclose(np.asarray(m2 - m1), 0.1 * 7.0, rtol=1e-5)

    def loss(cb):
        y, _, _ = batch_norm_relu_train(x, scale, bias, rm, rv, conv_bias=cb)
        return jnp.sum(y**2)

    g = jax.grad(loss)(conv_bias)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_batch_norm_relu_train_grads_match_autodiff():
    """The hand-derived VJP matches autodiff of the unfused composition.
    The bf16 x_hat residual bounds the agreement at ~1% of the gradient
    scale (measured ~0.5% on the training shapes)."""
    from igdm_tpu.ops.nn import batch_norm_relu_train

    x, scale, bias, rm, rv, conv_bias = _bn_relu_fixture(seed=9)

    def fused_loss(x, s, b):
        y, _, _ = batch_norm_relu_train(x, s, b, rm, rv, conv_bias=conv_bias)
        return jnp.sum(y**2)

    def ref_loss(x, s, b):
        y, _, _ = _bn_relu_composition(x, s, b, rm, rv, conv_bias)
        return jnp.sum(y**2)

    g_fused = jax.grad(fused_loss, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x, scale, bias)
    for gf, gr, name in zip(g_fused, g_ref, ("dx", "dscale", "dbias")):
        scale_ = float(jnp.max(jnp.abs(gr))) + 1e-8
        err = float(jnp.max(jnp.abs(gf - gr)))
        assert err <= 0.02 * scale_, f"{name}: {err} vs scale {scale_}"


def test_batch_norm_relu_train_bf16_input():
    """bf16 conv output (the mixed-precision production case): statistics
    accumulate in f32 and y keeps the input dtype."""
    from igdm_tpu.ops.nn import batch_norm_relu_train

    x, scale, bias, rm, rv, conv_bias = _bn_relu_fixture(seed=10)
    xb = x.astype(jnp.bfloat16)
    y, m, v = batch_norm_relu_train(xb, scale, bias, rm, rv, conv_bias=conv_bias)
    assert y.dtype == jnp.bfloat16
    assert m.dtype == jnp.float32 and v.dtype == jnp.float32
    want_y, want_m, want_v = _bn_relu_composition(
        x.astype(jnp.bfloat16).astype(jnp.float32), scale, bias, rm, rv, conv_bias
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want_y), rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(np.asarray(m), np.asarray(want_m), rtol=1e-3, atol=1e-4)


def test_group_norm_silu_train_matches_composition():
    """Fused GN+SiLU (+conv bias in the statistics) == bias-add ->
    group_norm -> silu, forward and all four gradients. GroupNorm is not
    shift-invariant to a per-channel bias, so conv_bias gets an exact
    gradient here (unlike batch_norm_relu_train's exact zero)."""
    from igdm_tpu.ops.nn import group_norm, group_norm_silu_train

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (2, 8, 8, 32)) * 1.5 + 0.3
    cb = jax.random.normal(jax.random.fold_in(key, 1), (32,)) * 0.4
    s = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (32,))
    b = 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (32,))

    def ref(x, s, b, cb):
        return silu(group_norm(x + cb, s, b, groups=8))

    def fused(x, s, b, cb):
        return group_norm_silu_train(x, s, b, conv_bias=cb, groups=8)

    np.testing.assert_allclose(
        np.asarray(fused(x, s, b, cb)), np.asarray(ref(x, s, b, cb)), rtol=1e-5, atol=1e-5
    )
    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2, 3))(x, s, b, cb)
    g_fused = jax.grad(lambda *a: jnp.sum(fused(*a) ** 2), argnums=(0, 1, 2, 3))(x, s, b, cb)
    for gr, gf, name in zip(g_ref, g_fused, ("dx", "dscale", "dbias", "dconv_bias")):
        scale_ = float(jnp.max(jnp.abs(gr))) + 1e-8
        err = float(jnp.max(jnp.abs(gf - gr)))
        assert err <= 0.02 * scale_, f"{name}: {err} vs scale {scale_}"


def test_group_norm_silu_train_bf16_keeps_dtype():
    from igdm_tpu.ops.nn import group_norm_silu_train

    x = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 4, 16), jnp.bfloat16)
    y = group_norm_silu_train(x, jnp.ones(16), jnp.zeros(16), groups=4)
    assert y.dtype == jnp.bfloat16


# ---------------------------------------------------------------------------
# Pallas FlashAttention


def _flash_case(key, b, h, n, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d), dtype)
    k = jax.random.normal(kk, (b, h, n, d), dtype)
    v = jax.random.normal(kv, (b, h, n, d), dtype)
    return q, k, v


def test_flash_attention_matches_reference():
    from igdm_tpu.ops.pallas.flash_attention import flash_attention, mha_reference

    for i, (b, h, n, d) in enumerate([(2, 3, 256, 32), (1, 2, 512, 64), (1, 1, 256, 128)]):
        q, k, v = _flash_case(jax.random.PRNGKey(10 + i), b, h, n, d)
        got = flash_attention(q, k, v, block_q=128, block_k=128)
        want = mha_reference(q, k, v, scale=1.0 / d**0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_attention_uneven_blocks():
    # block_q != block_k and blocks smaller than N exercise both tilings
    from igdm_tpu.ops.pallas.flash_attention import flash_attention, mha_reference

    q, k, v = _flash_case(jax.random.PRNGKey(20), 1, 2, 512, 32)
    got = flash_attention(q, k, v, block_q=256, block_k=128)
    want = mha_reference(q, k, v, scale=1.0 / 32**0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_attention_grads_match_reference():
    from igdm_tpu.ops.pallas.flash_attention import flash_attention, mha_reference

    q, k, v = _flash_case(jax.random.PRNGKey(21), 1, 2, 256, 32)

    def lf(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, block_q=128, block_k=128)))

    def lr(q, k, v):
        return jnp.sum(jnp.sin(mha_reference(q, k, v, scale=1.0 / 32**0.5)))

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_attention_bf16():
    from igdm_tpu.ops.pallas.flash_attention import flash_attention, mha_reference

    q, k, v = _flash_case(jax.random.PRNGKey(22), 1, 2, 256, 32, jnp.bfloat16)
    got = flash_attention(q, k, v, block_q=128, block_k=128)
    assert got.dtype == jnp.bfloat16
    want = mha_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        scale=1.0 / 32**0.5,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.05, atol=0.02
    )


def test_flash_attention_rejects_bad_shapes():
    import pytest

    from igdm_tpu.ops.pallas.flash_attention import flash_attention

    q, k, v = _flash_case(jax.random.PRNGKey(23), 1, 1, 192, 32)
    with pytest.raises(ValueError):
        flash_attention(q, k, v)  # N=192 not divisible by the 128-lane blocks


def test_spatial_attention_flash_path_matches_xla_path():
    from igdm_tpu.ops.attention import init_attention, spatial_self_attention

    key = jax.random.PRNGKey(24)
    params = init_attention(key, 32)
    # make proj non-zero so the attention output actually matters
    params["proj"]["w"] = jax.random.normal(jax.random.fold_in(key, 1), (32, 32)) * 0.1
    x = jax.random.normal(jax.random.fold_in(key, 2), (2, 16, 16, 32))
    ref = spatial_self_attention(params, x, use_flash=False)
    got = spatial_self_attention(params, x, use_flash=True)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
