"""BSON checkpoint import — parity with the reference's committed artifacts.

These tests read the real checkpoints from /root/reference (content only —
the reference is the ground truth being imported)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "trained_model.bson")),
    reason="reference checkpoints not available",
)


@pytest.fixture(scope="module")
def imported():
    from igdm_tpu.checkpoint.bson_import import import_simple_unet

    return import_simple_unet(os.path.join(REF, "trained_model.bson"))


def test_param_count_exact(imported):
    params, state, meta = imported
    assert meta["num_params"] == 847_169  # SURVEY.md section 2.5


def test_adam_rule_metadata(imported):
    _, _, meta = imported
    assert meta["adam_betas"] == (0.9, 0.999)
    assert 0 < meta["adam_lr"] < 1e-2


def test_shapes_match_our_init(imported):
    from igdm_tpu.models import unet_small

    params, state, _ = imported
    ours_p, ours_s = unet_small.init(jax.random.PRNGKey(0))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(ours_p)[0],
    ):
        assert pa == pb and np.shape(a) == np.shape(b), (pa, np.shape(a), pb, np.shape(b))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(state)[0],
        jax.tree_util.tree_flatten_with_path(ours_s)[0],
    ):
        assert pa == pb and np.shape(a) == np.shape(b)


def test_imported_model_predicts_noise(imported, dataset):
    """The trained checkpoint must beat the trivial zero predictor by a wide
    margin on the eps-prediction task it was trained on (T=5, x2-1 scaling) —
    the import-orientation discriminator."""
    from igdm_tpu.data.mat import normalize_pm1
    from igdm_tpu.diffusion.schedules import alphas_cumprod, linear_beta_schedule
    from igdm_tpu.models import unet_small
    from igdm_tpu.models.embeddings import timestep_embedding

    params, state, _ = imported
    imgs = normalize_pm1(dataset)
    T = 5
    alpha_bar = np.asarray(alphas_cumprod(linear_beta_schedule(T, 1e-4, 0.02)), np.float32)
    rng = np.random.default_rng(0)
    B = 64
    ts = rng.integers(1, T + 1, B)
    eps = rng.standard_normal((B, 32, 32, 1)).astype(np.float32)
    ab = alpha_bar[ts - 1].reshape(-1, 1, 1, 1)
    x_t = np.sqrt(ab) * imgs[:B] + np.sqrt(1 - ab) * eps
    t_emb = timestep_embedding(jnp.asarray(ts, jnp.float32), 128)
    pred, _ = unet_small.apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, state),
        jnp.asarray(x_t),
        t_emb,
        train=False,
    )
    mse = float(jnp.mean((pred - eps) ** 2))
    zero_mse = float(np.mean(eps**2))
    assert mse < 0.65 * zero_mse, (mse, zero_mse)


def test_sampling_from_imported_checkpoint(imported):
    """Full T=5 ancestral sampling with the reference's trained weights."""
    from igdm_tpu.config import DiffusionConfig
    from igdm_tpu.sampling.ancestral import sample_ddpm

    params, state, _ = imported
    out = sample_ddpm(
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, state),
        jax.random.PRNGKey(3),
        num_images=4,
        cfg=DiffusionConfig(num_steps=5),
    )
    o = np.asarray(out)
    assert o.shape == (4, 32, 32, 1)
    assert np.isfinite(o).all()
    assert o.min() >= -1.0 and o.max() <= 1.0


def test_epoch_checkpoints_import():
    from igdm_tpu.checkpoint.bson_import import import_simple_unet

    for ep in (5, 50, 95):
        params, state, meta = import_simple_unet(os.path.join(REF, f"ddpm_epoch_{ep}.bson"))
        assert meta["epoch"] == ep
        assert meta["num_params"] == 847_169


def test_epoch_checkpoints_differ():
    """Training progressed: epoch 5 and 95 weights must differ."""
    from igdm_tpu.checkpoint.bson_import import import_simple_unet

    p5, _, _ = import_simple_unet(os.path.join(REF, "ddpm_epoch_5.bson"))
    p95, _, _ = import_simple_unet(os.path.join(REF, "ddpm_epoch_95.bson"))
    diffs = [
        float(np.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(p5), jax.tree_util.tree_leaves(p95))
    ]
    assert max(diffs) > 1e-4
