"""Flow-matching family (training/flow, sampling/flow): ODE-solver numerics,
engine-contract parity, end-to-end training + checkpoint dispatch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from igdm_tpu.config import TrainConfig


def test_euler_exact_on_single_point_field():
    """For a single data point x0 the optimal linear-path velocity field is
    v(x, t) = (x - (1-t) x0)/t - x0, which is CONSTANT along every
    trajectory — so Euler integration is exact at any step count and must
    land exactly on x0 at t=0 from any noise draw."""
    from igdm_tpu.sampling.flow import sample_flow_ode

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 8, 8, 1)).astype(np.float32)
    )

    def vfn(x, t):
        return (x - (1.0 - t) * x0) / jnp.maximum(t, 1e-12) - x0

    for steps in (1, 3, 16):
        out = sample_flow_ode(
            vfn, jax.random.PRNGKey(42), num_images=4, image_size=(8, 8),
            channels=1, steps=steps, method="euler",
        )
        np.testing.assert_allclose(
            np.asarray(out), np.broadcast_to(np.asarray(x0), (4, 8, 8, 1)),
            atol=1e-5,
        )


def test_heun_second_order_on_linear_field():
    """dx/dt = -x integrated from t=1 to 0 has exact solution
    x(0) = x(1) * e. Heun's O(h^2) error must beat Euler's O(h) at the
    same step count by a wide margin."""
    from igdm_tpu.sampling.flow import sample_flow_ode

    def vfn(x, t):
        return -x

    key = jax.random.PRNGKey(7)
    x1 = jax.random.normal(key, (2, 4, 4, 1), jnp.float32)  # the same draw both runs make
    exact = np.asarray(x1) * np.e

    errs = {}
    for method in ("euler", "heun"):
        out = sample_flow_ode(
            vfn, key, num_images=2, image_size=(4, 4), channels=1,
            steps=20, method=method,
        )
        errs[method] = float(np.max(np.abs(np.asarray(out) - exact)))
    assert errs["heun"] < errs["euler"] / 10.0, errs
    assert errs["heun"] < 5e-3


def test_flow_loss_zero_for_perfect_model(monkeypatch):
    """flow_loss is exactly 0 when the model returns the true velocity."""
    from igdm_tpu.training import flow as F

    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((4, 8, 8, 1)).astype(np.float32))
    t = jnp.asarray([0.1, 0.4, 0.7, 0.99], jnp.float32)
    mask = jnp.ones((4,), jnp.float32)

    def fake_apply(params, x_t, ts, **kw):
        return eps - x0

    monkeypatch.setattr(F.unet4, "apply", fake_apply)
    loss = F.flow_loss({}, x0, t, eps, mask)
    assert float(loss) == 0.0


def test_train_flow_smoke_and_checkpoint_dispatch(tmp_path):
    """Tiny flow run end to end: losses finite and falling, checkpoint
    metadata routes sample_from_checkpoint to the ODE sampler, and the
    --timesteps override is rejected (continuous time has no grid)."""
    import pytest

    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.flow import train_flow

    rng = np.random.default_rng(1)
    imgs = rng.uniform(-1, 1, (32, 16, 16, 1)).astype(np.float32)
    res = train_flow(
        imgs,
        TrainConfig(epochs=6, batch_size=8, patience=100),
        base_ch=8, out_dir=str(tmp_path), log=None,
    )
    assert len(res.losses) == 6
    assert all(np.isfinite(l) for l in res.losses)
    assert res.losses[-1] < res.losses[0]

    ckpt = res.checkpoints[-1]
    for method, sampler in (("auto", "flow-euler"), ("heun", "flow-heun")):
        imgs01, info = sample_from_checkpoint(
            ckpt, jax.random.PRNGKey(0), num_images=3, ddim_steps=4,
            sampler=method,
        )
        assert imgs01.shape == (3, 16, 16)
        assert np.all(imgs01 >= 0.0) and np.all(imgs01 <= 1.0)
        assert info["sampler"] == sampler

    with pytest.raises(ValueError, match="continuous-time"):
        sample_from_checkpoint(
            ckpt, jax.random.PRNGKey(0), num_images=1, timesteps=10
        )


def test_flow_engine_multi_epoch_dispatch_parity():
    """k epochs in one jitted dispatch == k sequential dispatches,
    bit-exactly — the engine contract holds for the fifth family too."""
    from igdm_tpu.models import unet4
    from igdm_tpu.training.ddpm import make_optimizer
    from igdm_tpu.training.flow import build_flow_epoch_fn
    from igdm_tpu.training.train_state import TrainState

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(-1, 1, (16, 16, 16, 1)).astype(np.float32))
    cfg = TrainConfig(batch_size=8, lr=1e-3)
    tx = make_optimizer(cfg)

    def fresh_state():
        kp, kr = jax.random.split(jax.random.PRNGKey(0))
        params = unet4.init(kp, base_ch=8)
        return TrainState(
            params=params, model_state={}, opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32), rng=kr,
        )

    single = build_flow_epoch_fn(tx, 8, 16)
    multi = build_flow_epoch_fn(tx, 8, 16, epochs_per_dispatch=3)

    s1 = fresh_state()
    losses_seq = []
    for _ in range(3):
        s1, loss = single(s1, imgs)
        losses_seq.append(float(loss))

    s2, losses_vec = multi(fresh_state(), imgs)
    np.testing.assert_array_equal(np.asarray(losses_vec), np.asarray(losses_seq))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s1.params, s2.params,
    )


@pytest.mark.slow
def test_flow_cli_train(tmp_path):
    """igdm-train --model flow end to end on the bundled dataset subset."""
    from igdm_tpu.cli.train import main

    rc = main([
        "--model", "flow", "--epochs", "2", "--batch-size", "16",
        "--base-ch", "8", "--patience", "100", "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    assert (tmp_path / "flow_model.npz").exists()
    assert (tmp_path / "training_loss.png").exists()


def test_generate_coupling_is_consistent():
    """Coupling invariant: re-integrating the ODE from the returned eps
    reproduces the returned x0 (same solver, same grid; tolerance covers
    the different batch split → different XLA fusion between the chunked
    generate_coupling jit and the single 12-image re-integration)."""
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.flow import make_flow_velocity_fn, sample_flow_ode
    from igdm_tpu.training.flow import generate_coupling

    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    x0s, epss = generate_coupling(
        params, jax.random.PRNGKey(1), 12, image_size=(16, 16), channels=1,
        steps=4, method="euler", batch=8,
    )
    assert x0s.shape == epss.shape == (12, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(x0s)))
    vfn = make_flow_velocity_fn(params)
    redo = sample_flow_ode(
        vfn, None, num_images=12, image_size=(16, 16), channels=1,
        steps=4, method="euler", x_init=epss,
    )
    np.testing.assert_allclose(np.asarray(redo), np.asarray(x0s), atol=2e-5)


@pytest.mark.slow
def test_train_reflow_end_to_end(tmp_path):
    """Reflow fine-tunes a flow checkpoint on its own couplings; the student
    checkpoint keeps the flow sampler dispatch and records the coupling."""
    from igdm_tpu.checkpoint.pytree_io import load_for_sampling
    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.flow import train_flow, train_reflow

    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (32, 16, 16, 1)).astype(np.float32)
    res = train_flow(
        imgs, TrainConfig(epochs=3, batch_size=8, patience=100),
        base_ch=8, out_dir=str(tmp_path), log=None,
    )
    res2 = train_reflow(
        res.checkpoints[-1],
        TrainConfig(epochs=4, batch_size=8, patience=100),
        num_pairs=16, coupling_steps=2, coupling_method="euler",
        out_dir=str(tmp_path), log=None,
    )
    assert len(res2.losses) == 4
    assert all(np.isfinite(l) for l in res2.losses)
    _, _, meta = load_for_sampling(str(tmp_path / "reflow_model.npz"))
    assert meta["flow"]["reflow"] == 1
    assert meta["flow"]["coupling"]["num_pairs"] == 16
    imgs01, info = sample_from_checkpoint(
        str(tmp_path / "reflow_model.npz"), jax.random.PRNGKey(0),
        num_images=2, ddim_steps=2,
    )
    assert imgs01.shape == (2, 16, 16)
    assert info["sampler"] == "flow-euler"


def test_make_flow_sampler_matches_sample_flow():
    """The baked-weights serving sampler is the same program as sample_flow
    with params passed as arguments — identical outputs, f32."""
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.flow import make_flow_sampler, sample_flow

    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    fn = make_flow_sampler(
        params, num_images=4, image_size=(16, 16), steps=3, method="euler"
    )
    got = fn(jax.random.PRNGKey(5))
    want = sample_flow(
        params, jax.random.PRNGKey(5), num_images=4, image_size=(16, 16),
        steps=3, method="euler",
    )
    assert got.shape == (4, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_reflow_cli(tmp_path):
    """igdm-train --model reflow: teacher checkpoint -> reflowed student."""
    from igdm_tpu.cli.train import main

    rc = main([
        "--model", "flow", "--epochs", "2", "--batch-size", "16",
        "--base-ch", "8", "--patience", "100", "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    rc = main([
        "--model", "reflow", "--teacher", str(tmp_path / "flow_model.npz"),
        "--epochs", "2", "--batch-size", "8", "--coupling-pairs", "16",
        "--coupling-steps", "2", "--patience", "100", "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    assert (tmp_path / "reflow_model.npz").exists()
    rc = main(["--model", "reflow", "--epochs", "1"])
    assert rc == 2  # --teacher is required
