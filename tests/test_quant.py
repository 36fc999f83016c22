"""Int8 quantized-conv serving path (ops/quant.py + model wiring).

The reference has no quantization (f32 CPU BLAS throughout,
/root/reference/src/train_brain.jl:36); this is the TPU-native int8 MXU
serving study — the chip-measured outcomes (pixel T=500 +20% throughput
with a quality cost; decode negative) live in BASELINE.md round-5 int8
section. These tests pin the numerics contract on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from igdm_tpu.models import autoencoder, unet_small
from igdm_tpu.ops.nn import conv2d
from igdm_tpu.ops.quant import (
    conv2d_int8,
    conv2d_int8_from_f32,
    quantize_weight_int8,
)


def test_weight_quant_roundtrip_error_bound():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 16, 8), jnp.float32) * 0.2
    wq, scale = quantize_weight_int8(w)
    assert wq.dtype == jnp.int8 and scale.shape == (8,)
    # symmetric rounding: dequantized weight within half an lsb per channel
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(scale) - np.asarray(w))
    assert (err <= 0.5 * np.asarray(scale) + 1e-7).all()
    # the per-channel max hits full scale (127) exactly
    assert np.abs(np.asarray(wq)).max(axis=(0, 1, 2)).min() == 127


def test_conv2d_int8_close_to_f32():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 16, 8), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (8,), jnp.float32) * 0.01
    ref = conv2d(x, w, b)
    got = conv2d_int8_from_f32(x, w, b)
    rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)) / jnp.sqrt(jnp.mean(ref**2)))
    assert rel < 0.03, rel  # ~1% typical for 8-bit weights+activations


def test_conv2d_int8_static_scale_matches_dynamic():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 8, 8, 4), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 4, 4), jnp.float32)
    wq, ws = quantize_weight_int8(w)
    dyn = conv2d_int8(x, wq, ws)
    stat = conv2d_int8(x, wq, ws, xscale=jnp.float32(float(jnp.max(jnp.abs(x))) / 127.0))
    np.testing.assert_allclose(np.asarray(dyn), np.asarray(stat), atol=1e-5)


def test_decode_int8_close_and_calibrated():
    key = jax.random.PRNGKey(3)
    params = autoencoder.init(key, base_ch=8, latent_ch=4, depth=2)
    z = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 8, 4), jnp.float32)
    ref = autoencoder.decode(params, z)
    got_dyn = autoencoder.decode(params, z, compute_dtype="int8")
    scales = autoencoder.calibrate_decode_int8(params, z)
    assert set(scales) == {"conv1", "up1", "up2"}
    got_stat = autoencoder.decode(params, z, compute_dtype="int8", act_scales=scales)
    for got in (got_dyn, got_stat):
        assert got.shape == ref.shape
        rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)) / jnp.sqrt(jnp.mean(ref**2)))
        assert rel < 0.10, rel
    # static scales come from the f32 chain, dynamic from the quantized
    # chain's own (slightly different) activations — close, not identical
    # (fresh-init weights amplify the tail, so bound rmse + the 99th pct)
    d = np.abs(np.asarray(got_stat) - np.asarray(got_dyn))
    assert float(np.sqrt((d**2).mean())) < 0.05
    assert float(np.quantile(d, 0.99)) < 0.12


def test_apply_folded_int8_requires_scales_and_tracks_f32():
    key = jax.random.PRNGKey(4)
    params, state = unet_small.init(key)
    folded = unet_small.fold_bn(params, state)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 32, 32, 1), jnp.float32)
    t_emb = jnp.ones((2, 128), jnp.float32) * 0.1

    with pytest.raises(ValueError):
        unet_small.apply_folded(folded, x, t_emb, compute_dtype="int8")

    # calibrate via the tap, then the int8 forward tracks the f32 one
    scales = {}

    def tap(name, h):
        scales[name] = float(jnp.max(jnp.abs(h.astype(jnp.float32)))) / 127.0

    ref = unet_small.apply_folded(folded, x, t_emb, _tap=tap)
    assert set(scales) == {
        "down1.conv2", "down2.conv1", "down2.conv2", "mid.conv1", "mid.conv2",
        "up2.conv1", "up2.conv2", "up1.conv1", "up1.conv2",
    }
    got = unet_small.apply_folded(
        folded, x, t_emb, compute_dtype="int8", act_scales=scales
    )
    assert got.shape == ref.shape and got.dtype == jnp.float32
    rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)) / jnp.sqrt(jnp.mean(ref**2)))
    assert rel < 0.15, rel  # one fresh-init forward; serving error measured on chip


def test_unet4_int8_and_flow_calibration():
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.flow import calibrate_flow_int8, make_flow_sampler

    key = jax.random.PRNGKey(5)
    params = unet4.init(key, base_ch=8, levels=2)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 16, 1), jnp.float32)
    ts = jnp.full((2,), 100.0, jnp.float32)

    with pytest.raises(ValueError):
        unet4.apply(params, x, ts, compute_dtype="int8")

    ref = unet4.apply(params, x, ts, final_sigmoid=False)
    scales = calibrate_flow_int8(
        params, key, steps=2, num_images=2, image_size=(16, 16), n_keys=1
    )
    # every conv of the 2-level net got a scale
    assert {"down1.conv1", "down2.conv2", "mid.conv2", "up0.conv1",
            "up1.conv2"} <= set(scales)
    got = unet4.apply(params, x, ts, final_sigmoid=False,
                      compute_dtype="int8", act_scales=scales)
    assert got.shape == ref.shape
    rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)) / jnp.sqrt(jnp.mean(ref**2)))
    assert rel < 0.25, rel  # fresh-init net; trained-model error measured on chip

    # the baked int8 serving sampler auto-calibrates and runs end to end
    fn = make_flow_sampler(params, num_images=2, steps=1, method="euler",
                           image_size=(16, 16), compute_dtype="int8")
    out = fn(jax.random.PRNGKey(0))
    assert out.shape == (2, 16, 16, 1) and bool(jnp.isfinite(out).all())


def test_consistency_int8_sampler_runs():
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.consistency import make_consistency_sampler

    key = jax.random.PRNGKey(6)
    params = unet4.init(key, base_ch=8, levels=2)
    grid = [0, 125, 250, 375, 500]
    fn = make_consistency_sampler(
        params, grid, num_images=2, steps=2, image_size=(16, 16),
        compute_dtype="int8",
    )
    out = fn(jax.random.PRNGKey(1))
    assert out.shape == (2, 16, 16, 1) and bool(jnp.isfinite(out).all())

    with pytest.raises(ValueError):
        make_consistency_sampler(
            params, grid, num_images=2, model_kind="unet_small",
            compute_dtype="int8",
        )


def test_distilled_int8_sampler_runs():
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.ancestral import make_distilled_sampler

    key = jax.random.PRNGKey(7)
    params = unet4.init(key, base_ch=8, levels=2)
    grid = [0, 125, 250, 375, 500]
    fn = make_distilled_sampler(
        params, grid, num_images=2, image_size=(16, 16), compute_dtype="int8"
    )
    out = fn(jax.random.PRNGKey(1))
    assert out.shape == (2, 16, 16, 1) and bool(jnp.isfinite(out).all())

    with pytest.raises(ValueError):
        make_distilled_sampler(
            params, grid, num_images=2, model_kind="unet_small",
            compute_dtype="int8",
        )


def test_int8_guard_rails():
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.flow import calibrate_flow_int8

    key = jax.random.PRNGKey(8)
    params = unet4.init(key, base_ch=8, levels=2)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 16, 1), jnp.float32)
    ts = jnp.full((2,), 100.0, jnp.float32)

    # scales calibrated for a different architecture -> loud KeyError
    with pytest.raises(KeyError, match="down1.conv1"):
        unet4.apply(params, x, ts, compute_dtype="int8",
                    act_scales={"wrong": 1.0})

    # invalid ODE method rejected BEFORE the eager calibration forwards
    with pytest.raises(ValueError, match="unknown flow ODE method"):
        calibrate_flow_int8(params, key, method="midpoint", num_images=2,
                            image_size=(16, 16))

    # decoder: missing conv key -> loud KeyError, not a silent dynamic
    # fallback that loses the static-scale speedup
    ae = autoencoder.init(jax.random.fold_in(key, 2), base_ch=8, latent_ch=4)
    z = jax.random.normal(jax.random.fold_in(key, 3), (2, 8, 8, 4), jnp.float32)
    with pytest.raises(KeyError, match="up1"):
        autoencoder.decode(ae, z, compute_dtype="int8", act_scales={"conv1": 0.1})
