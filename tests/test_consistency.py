"""Consistency distillation (training/consistency.py, sampling/consistency.py)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igdm_tpu.config import DiffusionConfig


def _ab_ext(cfg):
    from igdm_tpu.diffusion.schedules import alphas_cumprod, betas_for_config

    ab = jnp.asarray(alphas_cumprod(betas_for_config(cfg)), jnp.float32)
    return jnp.concatenate([jnp.ones((1,), jnp.float32), ab])


def test_boundary_condition_exact_at_t_min():
    """The parameterization must satisfy f(x, t_min) = x/alpha_1 with
    c_skip(1) = 1 and c_out(1) = 0 EXACTLY (Song et al. eq. 5) — the
    boundary is what makes 1-step sampling well-posed."""
    from igdm_tpu.training.consistency import consistency_scalings

    for schedule in ("linear", "cosine"):
        cfg = DiffusionConfig(num_steps=64, schedule=schedule)
        cs, co, a = consistency_scalings(_ab_ext(cfg), jnp.asarray([1]))
        assert float(cs[0]) == 1.0
        assert float(co[0]) == 0.0
        assert float(a[0]) > 0.99


def test_scalings_monotone_and_bounded():
    """c_skip falls monotonically from 1 toward 0 as t rises; c_out rises
    from 0 and stays below sigma_data — the variance-controlled output
    scaling of the EDM parameterization."""
    from igdm_tpu.training.consistency import SIGMA_DATA, consistency_scalings

    cfg = DiffusionConfig(num_steps=128, schedule="cosine")
    ts = jnp.arange(1, 129)
    cs, co, _ = consistency_scalings(_ab_ext(cfg), ts)
    cs, co = np.asarray(cs), np.asarray(co)
    assert (np.diff(cs) <= 1e-7).all() and cs[0] == 1.0 and cs[-1] < 0.05
    assert (np.diff(co) >= -1e-7).all() and co[0] == 0.0
    assert (co <= SIGMA_DATA + 1e-6).all()


def test_consistency_grid_endpoints_and_spacing():
    from igdm_tpu.training.consistency import consistency_grid

    g = consistency_grid(500, 18)
    assert g[0] == 1 and g[-1] == 500 and len(g) == 19
    assert (np.diff(g) > 0).all()
    with pytest.raises(ValueError):
        consistency_grid(5, 18)


def test_mid_indices_interior_placement():
    """Multistep re-noise points sit at interior midpoints of an even
    partition (Song et al. alg. 1), never at the extreme boundaries:
    steps=2 on an 18-interval grid re-noises at mid-grid (index 9, t ~ T/2),
    not at index 17 (which keeps only ~9%% of the 1-step estimate on a
    T=500 linear schedule) — round-3 advisor finding."""
    from igdm_tpu.sampling.consistency import _mid_indices

    assert _mid_indices(18, 1).tolist() == []
    assert _mid_indices(18, 2).tolist() == [9]
    assert _mid_indices(18, 3).tolist() == [12, 6]
    assert _mid_indices(18, 4).tolist() == [14, 9, 4]
    for steps in range(2, 8):
        m = _mid_indices(18, steps)
        assert (m > 0).all() and (m < 18).all()
        assert (np.diff(m) < 0).all()


@pytest.mark.slow
def test_consistency_distill_end_to_end_tiny():
    """CD a tiny random unet4 on CPU: losses finite and falling, and both
    the 1-step and multistep samplers produce finite images with the
    multistep path differing from (refining) the 1-step output."""
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.consistency import sample_consistency
    from igdm_tpu.training.consistency import consistency_distill

    cfg = DiffusionConfig(num_steps=32)
    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    imgs = jax.random.uniform(
        jax.random.PRNGKey(1), (16, 16, 16, 1), jnp.float32, -1.0, 1.0
    )
    student, grid, losses = consistency_distill(
        params, imgs, diff_cfg=cfg, n_grid=4, steps=20, batch_size=8,
        steps_per_dispatch=10, compute_dtype=None, log=None,
    )
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    out1 = sample_consistency(
        student, grid, jax.random.PRNGKey(2), num_images=2,
        image_size=(16, 16), steps=1, cfg=cfg,
    )
    out3 = sample_consistency(
        student, grid, jax.random.PRNGKey(2), num_images=2,
        image_size=(16, 16), steps=3, cfg=cfg,
    )
    assert out1.shape == (2, 16, 16, 1) and out3.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out1)).all() and np.isfinite(np.asarray(out3)).all()
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_make_consistency_sampler_matches_sample_consistency():
    """The baked serving sampler and the params-as-args path must agree to
    float rounding (same RNG derivation and algebra; they are different
    compiled programs, so fusions differ at the last ulp)."""
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.consistency import (
        make_consistency_sampler,
        sample_consistency,
    )
    from igdm_tpu.training.consistency import consistency_grid

    cfg = DiffusionConfig(num_steps=32)
    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    grid = consistency_grid(32, 4)
    key = jax.random.PRNGKey(7)
    a = sample_consistency(
        params, grid, key, num_images=2, image_size=(16, 16), steps=2, cfg=cfg
    )
    fn = make_consistency_sampler(
        params, grid, cfg=cfg, num_images=2, image_size=(16, 16), steps=2
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(fn(key)), atol=1e-5)


def test_consistency_checkpoint_auto_dispatch(tmp_path):
    """A checkpoint carrying meta['consistency'] dispatches to the 1-call
    sampler through sampling.auto (the CLI path), and rejects a
    --timesteps override (the grid indexes the ORIGINAL schedule)."""
    from igdm_tpu.checkpoint.pytree_io import _flatten_with_paths
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.auto import sample_from_checkpoint

    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    payload = {
        f"params/{k}": np.asarray(v) for k, v in _flatten_with_paths(params).items()
    }
    meta = {
        "model": "unet4",
        "diff_cfg": {"num_steps": 32},
        "consistency": {"grid": [1, 8, 16, 24, 32], "sigma_data": 0.5},
    }
    payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    path = str(tmp_path / "cd.npz")
    np.savez(path, **payload)
    imgs01, info = sample_from_checkpoint(path, jax.random.PRNGKey(1), num_images=2)
    assert info["sampler"] == "consistency" and info["T"] == 1
    assert imgs01.shape == (2, 32, 32)
    assert np.isfinite(imgs01).all()
    assert imgs01.min() >= 0.0 and imgs01.max() <= 1.0
    # explicit steps override reaches the multistep operating points
    # through the same entry point (CLI --steps; round-3 advisor finding)
    imgs2, info2 = sample_from_checkpoint(
        path, jax.random.PRNGKey(1), num_images=2, steps=2
    )
    assert info2["T"] == 2
    assert not np.allclose(imgs01, imgs2)
    with pytest.raises(ValueError, match="consistency"):
        sample_from_checkpoint(path, jax.random.PRNGKey(1), num_images=2, timesteps=8)


@pytest.mark.slow
def test_consistency_self_map_of_clean_data():
    """Sanity on an UNTRAINED net: near t_min the boundary dominates, so
    f(x_1, 1) stays close to x_1 regardless of the network — the
    parameterization (not the weights) carries the guarantee."""
    from igdm_tpu.models import unet4
    from igdm_tpu.training.consistency import consistency_fn
    from igdm_tpu.training.ddpm import make_apply_fn

    cfg = DiffusionConfig(num_steps=64, schedule="cosine")
    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    apply_fn = make_apply_fn("unet4", cfg.embed_dim)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1), jnp.float32, -1, 1)
    t = jnp.full((2,), 1, jnp.int32)
    f = consistency_fn(apply_fn, params, {}, x, t, _ab_ext(cfg))
    np.testing.assert_allclose(np.asarray(f), np.asarray(x), atol=5e-3)
