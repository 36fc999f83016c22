"""SR3-style super-resolution (training/superres.py, sampling/superres.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from igdm_tpu.config import DiffusionConfig, TrainConfig


def test_make_lowres_and_upsample_shapes():
    from igdm_tpu.training.superres import make_lowres, upsample_to

    x = jnp.arange(2 * 16 * 16 * 1, dtype=jnp.float32).reshape(2, 16, 16, 1)
    lo = make_lowres(x, 2)
    assert lo.shape == (2, 8, 8, 1)
    # average pooling: first 2x2 block mean
    np.testing.assert_allclose(
        float(lo[0, 0, 0, 0]), float(x[0, :2, :2, 0].mean()), rtol=1e-6
    )
    hi = upsample_to(lo, (16, 16))
    assert hi.shape == (2, 16, 16, 1)
    # bicubic preserves the mean on a linear ramp interior
    np.testing.assert_allclose(float(hi.mean()), float(lo.mean()), rtol=1e-3)


def test_train_superres_smoke(tmp_path):
    import json

    from igdm_tpu.training.superres import train_superres

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (24, 16, 16, 1)).astype(np.float32)
    res = train_superres(
        imgs, 2,
        DiffusionConfig(num_steps=8),
        TrainConfig(epochs=8, batch_size=8, patience=100),
        base_ch=8, out_dir=str(tmp_path), log=None,
    )
    assert np.isfinite(res.losses).all()
    assert np.mean(res.losses[-3:]) < np.mean(res.losses[:3])
    with np.load(res.checkpoints[0]) as z:
        meta = json.loads(bytes(z["__meta__"]))
    assert meta["superres"] == {"factor": 2}


def test_upscale_cli(tmp_path, monkeypatch):
    """End-to-end CLI: train a tiny upscaler, upscale a PNG, check output."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.image as mpimg

    from igdm_tpu.cli.upscale import main as upscale_main
    from igdm_tpu.training.superres import train_superres

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (16, 16, 16, 1)).astype(np.float32)
    res = train_superres(
        imgs, 2, DiffusionConfig(num_steps=8),
        TrainConfig(epochs=2, batch_size=8, patience=100),
        base_ch=8, out_dir=str(tmp_path), log=None,
    )
    png = str(tmp_path / "lowres.png")
    mpimg.imsave(png, rng.uniform(0, 1, (8, 8)), cmap="gray")
    monkeypatch.chdir(tmp_path)
    rc = upscale_main([res.checkpoints[0], png, "--steps", "4", "--out", "up.png"])
    assert rc == 0 and (tmp_path / "up.png").exists()


def test_sample_superres_shape_determinism_and_conditioning():
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.superres import sample_superres

    cfg = DiffusionConfig(num_steps=16)
    # in_channels = concat(x_t, cond) = 2C, prediction head = C (the SR3
    # layout train_superres uses; out_channels defaults to in_channels)
    params = unet4.init(jax.random.PRNGKey(0), in_channels=2, base_ch=8, out_channels=1)
    key = jax.random.PRNGKey(1)
    lo_a = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 1), jnp.float32, -1, 1)
    lo_b = -lo_a
    a1 = sample_superres(params, lo_a, key, cfg=cfg, num_sample_steps=6)
    a2 = sample_superres(params, lo_a, key, cfg=cfg, num_sample_steps=6)
    b = sample_superres(params, lo_b, key, cfg=cfg, num_sample_steps=6)
    assert a1.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(a1)).all()
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))  # deterministic
    assert float(jnp.abs(a1 - b).max()) > 1e-5  # conditioning matters
