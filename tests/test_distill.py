"""Progressive distillation (training/distill.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from igdm_tpu.config import DiffusionConfig


def test_distill_target_recovers_constant_x0():
    """Algebra pin: if the teacher's two DDIM steps carry a constant
    x0-prediction c, the solved single-step target must be exactly c —
    any error in the (alpha, sigma) bookkeeping breaks this identity."""
    from igdm_tpu.training.distill import _coeffs, distill_target

    ab = jnp.asarray(
        np.cumprod(1.0 - np.linspace(1e-4, 0.02, 100)), jnp.float32
    )
    ab_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), ab])
    c = 0.4321
    t, u, s = 80, 40, 10
    a_t, s_t = _coeffs(ab_ext, t)
    a_u, s_u = _coeffs(ab_ext, u)
    a_s, s_s = _coeffs(ab_ext, s)
    x_t = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 8, 1)), jnp.float32)
    eps_t = (x_t - a_t * c) / s_t
    x_u = a_u * c + s_u * eps_t
    eps_u = (x_u - a_u * c) / s_u
    x_s = a_s * c + s_s * eps_u
    tgt = distill_target(x_t, x_s, a_t, s_t, a_s, s_s)
    np.testing.assert_allclose(np.asarray(tgt), c, atol=1e-4)


def test_phase_grids_are_nested_halvings():
    from igdm_tpu.training.distill import _phase_grids

    grids = _phase_grids(512, (64, 32, 16, 8))
    for (sg, tg), n in zip(grids, (64, 32, 16, 8)):
        assert len(sg) == n + 1 and len(tg) == 2 * n + 1
        np.testing.assert_array_equal(sg, tg[::2])  # teacher pairs land on student boundaries
        assert sg[0] == 0 and sg[-1] == 512
    # consecutive phases: next teacher grid is this student grid
    for (sg, _), (_, tg2) in zip(grids[:-1], grids[1:]):
        np.testing.assert_array_equal(sg, tg2)


@pytest.mark.slow
def test_distill_end_to_end_tiny():
    """Distill a tiny random unet4 32 -> 8 -> 4 steps on CPU: losses must be
    finite and fall within each phase, and the distilled student must
    sample finite in-range images over its 4-step grid."""
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.ancestral import sample_distilled
    from igdm_tpu.training.distill import distill_ddpm

    cfg = DiffusionConfig(num_steps=32)
    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    imgs = jax.random.uniform(
        jax.random.PRNGKey(1), (16, 16, 16, 1), jnp.float32, -1.0, 1.0
    )
    snapshots = []
    student, grid, losses = distill_ddpm(
        params, imgs, diff_cfg=cfg, phases=(8, 4), steps_per_phase=30,
        convert_steps=30, batch_size=8, model_kind="unet4", compute_dtype=None,
        steps_per_dispatch=15, log=None,
        on_phase_end=lambda n, p, g: snapshots.append((n, p, list(g))),
    )
    # every intermediate student snapshotted with its own grid
    assert [n for n, _, _ in snapshots] == [8, 4]
    assert len(snapshots[0][2]) == 9 and snapshots[1][2] == list(grid)
    # eps->v conversion pre-phase + the two halving phases
    assert len(losses) == 3 and all(np.isfinite(l).all() for l in losses)
    for phase in losses:  # trained vs untrained: end below start
        assert np.mean(phase[-10:]) < np.mean(phase[:10])
    assert list(grid) == list(np.round(np.linspace(0, 32, 5)).astype(int))
    out = sample_distilled(
        student, grid, jax.random.PRNGKey(2), num_images=2,
        image_size=(16, 16), cfg=cfg, model_kind="unet4",
    )
    o = np.asarray(out)
    assert o.shape == (2, 16, 16, 1)
    assert np.isfinite(o).all() and o.min() >= -1.0 and o.max() <= 1.0


def test_make_distilled_sampler_matches_sample_distilled():
    """The baked serving sampler is the same function as sample_distilled
    (weights as XLA constants change nothing numerically in f32)."""
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.ancestral import make_distilled_sampler, sample_distilled

    cfg = DiffusionConfig(num_steps=32)
    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    grid = [0, 8, 16, 24, 32]
    key = jax.random.PRNGKey(3)
    ref = sample_distilled(
        params, grid, key, num_images=2, image_size=(16, 16), cfg=cfg,
        model_kind="unet4",
    )
    fn = make_distilled_sampler(
        params, grid, cfg=cfg, num_images=2, image_size=(16, 16),
        model_kind="unet4",
    )
    np.testing.assert_allclose(np.asarray(fn(key)), np.asarray(ref), atol=1e-6)


def test_distilled_checkpoint_auto_dispatch(tmp_path):
    """A checkpoint carrying meta['distill'] dispatches to the student's
    grid sampler through sampling.auto (the CLI path)."""
    import json

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
        "train_cfg": {"objective": "v"},
        "distill": {"grid": [0, 8, 16, 24, 32], "objective": "v"},
    }
    payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    path = str(tmp_path / "student.npz")
    np.savez(path, **payload)
    imgs01, info = sample_from_checkpoint(path, jax.random.PRNGKey(1), num_images=2)
    assert info["sampler"] == "distilled" and info["T"] == 4
    assert imgs01.shape == (2, 32, 32)
    assert np.isfinite(imgs01).all()


def test_distilled_checkpoint_rejects_timesteps_override(tmp_path):
    """ADVICE r2: a distilled student's grid indexes the ORIGINAL training
    schedule; a --timesteps override would silently clamp out-of-bounds
    gathers instead of erroring. sample_from_checkpoint must refuse."""
    import json

    import pytest

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
        "train_cfg": {"objective": "v"},
        "distill": {"grid": [0, 8, 16, 24, 32], "objective": "v"},
    }
    payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    path = str(tmp_path / "student.npz")
    np.savez(path, **payload)
    with pytest.raises(ValueError, match="distilled"):
        sample_from_checkpoint(path, jax.random.PRNGKey(1), num_images=2, timesteps=8)
    # matching T is a no-op, not an error
    imgs01, _ = sample_from_checkpoint(
        path, jax.random.PRNGKey(1), num_images=2, timesteps=32
    )
    assert imgs01.shape == (2, 32, 32)
