"""Ports of the reference test suite's six behaviors (test/runtests.jl:1-51),
plus the README-documented API surface."""

import os

import numpy as np
import pytest

import igdm_tpu


def test_generate_grid():
    canvas = igdm_tpu.generate_grid()
    assert os.path.isfile("grid.png")
    assert canvas.shape == (256, 256)
    assert canvas.dtype == np.float32


def test_generate_grid_matches_dataset(dataset):
    canvas = igdm_tpu.generate_grid()
    # block (i, j) holds image i*8+j (reference tiling order,
    # src/ImageGenerationDiffusionModels.jl:34-38)
    np.testing.assert_array_equal(canvas[:32, :32], dataset[0, :, :, 0])
    np.testing.assert_array_equal(canvas[:32, 32:64], dataset[1, :, :, 0])
    np.testing.assert_array_equal(canvas[32:64, :32], dataset[8, :, :, 0])


def test_apply_noise_changes_image_and_writes_png():
    img = np.full((64, 64), 0.7, np.float32)  # 64x64: size-genericity per ref test
    noisy = igdm_tpu.apply_noise(img)
    assert noisy.shape == (64, 64)
    assert not np.allclose(noisy, img)
    assert os.path.isfile("noisy_img.png")


def test_apply_noise_with_injected_eps_is_exact():
    # with explicit eps, apply_noise is exactly a*img + b*eps (the fused
    # closed form of the reference's shared-eps loop)
    from igdm_tpu.diffusion.processes import apply_noise_coeffs

    a, b = apply_noise_coeffs(500, 1e-4, 0.02)
    rng = np.random.default_rng(1)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    eps = rng.standard_normal((32, 32)).astype(np.float32)
    noisy = igdm_tpu.apply_noise(img, eps=eps, output_path=None)
    np.testing.assert_allclose(noisy, a * img + b * eps, rtol=1e-5, atol=1e-6)


def test_denoise_image_shape_and_file():
    img = np.full((32, 32), 0.5, np.float32)
    noisy = igdm_tpu.apply_noise(img)
    den = igdm_tpu.denoise_image(noisy)
    assert den.shape == (32, 32)
    assert os.path.isfile("denoised_img.png")
    assert den.min() >= 0.0 and den.max() <= 1.0


def test_train_brain_smoke():
    losses = igdm_tpu.train_brain(1)
    assert len(losses) == 1
    assert np.isfinite(losses[0])


def test_train_documented_signature_reduces_loss(dataset):
    losses = igdm_tpu.train(dataset[:64], 1e-3, 10, 10, 0.0)
    assert len(losses) >= 2
    assert losses[-1] < losses[0]


def test_generate_image_from_noise():
    gen = igdm_tpu.generate_image_from_noise()
    assert gen.shape == (32, 32)
    assert (gen >= 0).all() and (gen <= 1).all()


def test_generate_image_mlp_path():
    out = igdm_tpu.generate_image(num_images=2)
    assert out.shape == (2, 32, 32)


def test_sinusoidal_embedding_shape():
    emb = np.asarray(igdm_tpu.sinusoidal_embedding(np.array([0.0, 1.0, 2.0], np.float32), 8))
    assert emb.shape == (3, 8)


def test_sinusoidal_embedding_values():
    # row 0: t=0 -> sin half zeros, cos half ones
    emb = np.asarray(igdm_tpu.sinusoidal_embedding(np.array([0.0], np.float32), 8))
    np.testing.assert_allclose(emb[0, :4], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, 4:], 1.0, atol=1e-7)


def test_demo_runs():
    out = igdm_tpu.demo()
    assert set(out) == {"grid", "noisy", "denoised", "generated"}
    for f in ("grid.png", "noisy_img.png", "denoised_img.png"):
        assert os.path.isfile(f)


def test_julia_name_shim():
    import ImageGenerationDiffusionModels as IGDM

    assert IGDM.generate_grid is igdm_tpu.generate_grid
    assert set(IGDM.__all__) >= {
        "generate_grid", "apply_noise", "train", "denoise_image", "generate_image",
        "train_brain", "generate_image_from_noise",
    }


def test_denoise_image_rejects_wrong_size():
    with pytest.raises(ValueError, match="32x32"):
        igdm_tpu.denoise_image(np.zeros((64, 64), np.float32))


def test_train_accepts_mat_path(tmp_path, monkeypatch):
    # README usage: train("SyntheticImages500.mat") (README.md:66)
    import shutil

    from igdm_tpu.data.mat import dataset_path

    local = tmp_path / "SyntheticImages500.mat"
    shutil.copy(dataset_path(), local)
    losses = igdm_tpu.train(str(local), 1e-3, 1, 10, 0.0)
    assert len(losses) == 1 and np.isfinite(losses[0])
