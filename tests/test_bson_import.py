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


@pytest.mark.slow
def test_epoch_trajectory_discriminator(dataset):
    """20-point import-orientation evidence (VERDICT.md round-1 task 5):
    evaluate every committed checkpoint (ddpm_epoch_5..95 + trained_model) on
    the exact training objective (T=5, x2-1 scaling, eps-MSE over the whole
    dataset, src/train_brain.jl:225-241) and assert the loss trajectory
    behaves like a real training run. Any per-layer transposition/flip error
    in the importer would destroy this monotone structure."""
    from igdm_tpu.checkpoint.bson_import import import_simple_unet
    from igdm_tpu.data.mat import normalize_pm1
    from igdm_tpu.diffusion.schedules import alphas_cumprod, linear_beta_schedule
    from igdm_tpu.models import unet_small
    from igdm_tpu.models.embeddings import timestep_embedding

    imgs = normalize_pm1(dataset)  # (500, 32, 32, 1)
    T = 5
    alpha_bar = np.asarray(alphas_cumprod(linear_beta_schedule(T, 1e-4, 0.02)), np.float32)
    rng = np.random.default_rng(7)
    n = imgs.shape[0]
    ts = rng.integers(1, T + 1, n)
    eps = rng.standard_normal(imgs.shape).astype(np.float32)
    ab = alpha_bar[ts - 1].reshape(-1, 1, 1, 1)
    x_t = jnp.asarray(np.sqrt(ab) * imgs + np.sqrt(1 - ab) * eps)
    t_emb = timestep_embedding(jnp.asarray(ts, jnp.float32), 128)
    eps_j = jnp.asarray(eps)

    @jax.jit
    def objective(params, state):
        pred, _ = unet_small.apply(params, state, x_t, t_emb, train=False)
        return jnp.mean((pred - eps_j) ** 2)

    epochs = list(range(5, 100, 5))
    losses = []
    for ep in epochs:
        params, state, _ = import_simple_unet(os.path.join(REF, f"ddpm_epoch_{ep}.bson"))
        losses.append(float(objective(
            jax.tree_util.tree_map(jnp.asarray, params),
            jax.tree_util.tree_map(jnp.asarray, state),
        )))
    params, state, _ = import_simple_unet(os.path.join(REF, "trained_model.bson"))
    final_loss = float(objective(
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, state),
    ))

    zero_mse = float(np.mean(eps**2))  # the trivial eps=0 predictor
    assert all(l < zero_mse for l in losses + [final_loss]), (losses, final_loss, zero_mse)
    # broadly decreasing: later checkpoints beat earlier ones
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    # epoch-vs-loss correlation is strongly negative
    corr = np.corrcoef(epochs, losses)[0, 1]
    assert corr < -0.5, (corr, losses)
    # the final model is in family with the late checkpoints
    assert final_loss < np.mean(losses[:5]), (final_loss, losses)


def test_shared_unet4_export_import_roundtrip(tmp_path):
    """import_shared_unet4 against a synthetic gen-3 checkpoint (VERDICT.md
    round-1 task 4): the reference never committed a last_desperate_attempt
    .bson, so one is synthesized with checkpoint.bson_writer mirroring
    shared.jl:128-172 field order, then round-tripped through the real
    bytes -> load_bson -> import path."""
    from igdm_tpu.checkpoint.bson_import import import_shared_unet4
    from igdm_tpu.checkpoint.bson_writer import export_shared_unet4
    from igdm_tpu.models import unet4

    orig = unet4.init(jax.random.PRNGKey(11), 1, 16)  # base_ch=16 fixture
    path = str(tmp_path / "gen3_fixture.bson")
    export_shared_unet4(path, orig, mu=0.37, sigma=1.21)

    params, meta = import_shared_unet4(path)
    assert meta["mu"] == pytest.approx(0.37)
    assert meta["sigma"] == pytest.approx(1.21)

    flat_o = jax.tree_util.tree_flatten_with_path(orig)[0]
    flat_i = jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(jnp.asarray, params)
    )[0]
    assert [p for p, _ in flat_o] == [p for p, _ in flat_i]
    for (pa, a), (_, b) in zip(flat_o, flat_i):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0, err_msg=str(pa))

    # and the imported tree actually runs through the unet4 forward
    x = jnp.zeros((2, 32, 32, 1), jnp.float32)
    out = unet4.apply(jax.tree_util.tree_map(jnp.asarray, params), x, jnp.array([1, 2]))
    assert out.shape == (2, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_bson_writer_primitives(tmp_path):
    """save_bson -> load_bson round-trip of the writer's node vocabulary."""
    from igdm_tpu.checkpoint.bson_reader import JuliaStruct, load_bson
    from igdm_tpu.checkpoint.bson_writer import jl_array, jl_struct, jl_tuple, save_bson

    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    doc = {
        "s": jl_struct("Main.Thing", [jl_array(arr), jl_tuple([1, 2]), 3.5, True, None, "x"]),
        "n": 42,
        "f": 2.5,
    }
    path = str(tmp_path / "prim.bson")
    save_bson(path, doc)
    out = load_bson(path)
    assert out["n"] == 42 and out["f"] == 2.5
    s = out["s"]
    assert isinstance(s, JuliaStruct) and s.typename == "Main.Thing"
    np.testing.assert_array_equal(s.fields[0], arr)  # column-major round-trip
    assert s.fields[1] == (1, 2)
    assert s.fields[2:] == [3.5, True, None, "x"]
