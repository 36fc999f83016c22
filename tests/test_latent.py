"""Latent diffusion: VAE, latent DDPM training, clip-free sampling, dispatch."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igdm_tpu.config import DiffusionConfig, TrainConfig


@pytest.fixture(scope="module")
def tiny_imgs():
    rng = np.random.default_rng(0)
    # smooth, compressible content (random low-freq blobs), 16x16
    base = rng.standard_normal((24, 4, 4, 1)).astype(np.float32)
    up = np.repeat(np.repeat(base, 4, axis=1), 4, axis=2)
    return np.clip(up * 0.5, -1.0, 1.0)


@pytest.mark.slow
def test_autoencoder_shapes_and_roundtrip_improves(tiny_imgs):
    from igdm_tpu.models import autoencoder
    from igdm_tpu.training.latent import train_autoencoder

    p0 = autoencoder.init(jax.random.PRNGKey(0), base_ch=8, latent_ch=4)
    m, lv = autoencoder.encode(p0, jnp.asarray(tiny_imgs))
    assert m.shape == (24, 4, 4, 4) and lv.shape == m.shape
    rec0 = autoencoder.decode(p0, m)
    assert rec0.shape == tiny_imgs.shape
    mse0 = float(np.mean((np.asarray(rec0) - tiny_imgs) ** 2))

    params, losses, scale = train_autoencoder(
        tiny_imgs, epochs=40, batch_size=8, base_ch=8, latent_ch=4,
        out_path=None, log=None,
    )
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    m1, _ = autoencoder.encode(params, jnp.asarray(tiny_imgs))
    rec1 = autoencoder.decode(params, m1)
    mse1 = float(np.mean((np.asarray(rec1) - tiny_imgs) ** 2))
    assert mse1 < mse0  # training actually reconstructs better
    assert scale > 0.0 and np.isfinite(scale)


def test_vae_kl_term_regularizes():
    """kl_weight scales the KL penalty: the total loss with a huge weight
    must exceed the pure-reconstruction loss on the same params/key."""
    from igdm_tpu.models import autoencoder

    p = autoencoder.init(jax.random.PRNGKey(0), base_ch=8, latent_ch=2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1), jnp.float32, -1, 1)
    k = jax.random.PRNGKey(2)
    l_small, aux = autoencoder.vae_loss(p, x, k, kl_weight=0.0)
    l_big, _ = autoencoder.vae_loss(p, x, k, kl_weight=10.0)
    assert l_big > l_small
    assert float(aux["kl"]) >= 0.0


@pytest.mark.slow
def test_latent_ddpm_end_to_end_and_dispatch(tiny_imgs, tmp_path):
    """Full LDM pipeline on CPU: AE -> latent DDPM -> auto dispatch samples
    pixel-space images (clip-free latent sampler + decode)."""
    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.latent import train_autoencoder, train_latent_ddpm

    ae_path = str(tmp_path / "ae.npz")
    train_autoencoder(
        tiny_imgs, epochs=10, batch_size=8, base_ch=8, latent_ch=4,
        out_path=ae_path, log=None,
    )
    res, ckpt = train_latent_ddpm(
        tiny_imgs, ae_path,
        DiffusionConfig(num_steps=8),
        TrainConfig(batch_size=8, epochs=2, patience=50, checkpoint_every=0),
        base_ch=8, levels=2, out_dir=str(tmp_path), log=None,
    )
    assert os.path.isfile(ckpt)
    assert np.isfinite(res.losses).all()

    imgs01, info = sample_from_checkpoint(
        ckpt, jax.random.PRNGKey(0), num_images=3, ddim_steps=4
    )
    assert info["sampler"] == "latent-ddim"
    assert imgs01.shape == (3, 16, 16)
    assert np.isfinite(imgs01).all()
    assert imgs01.min() >= 0.0 and imgs01.max() <= 1.0

    # ancestral latent path too
    imgs01b, info_b = sample_from_checkpoint(
        ckpt, jax.random.PRNGKey(0), num_images=2, sampler="textbook"
    )
    assert info_b["sampler"] == "latent-ancestral"
    assert imgs01b.shape == (2, 16, 16)


def test_make_latent_sampler_matches_sample_latent():
    """The baked serving sampler (weights as XLA constants, decode fused
    into the trajectory program) matches the argument-passing f32 path to
    within XLA refusion rounding (~1e-6 — constant-folding changes fusion
    order, same property the pixel make_sampler has), and the bf16 serving
    config stays within bf16 rounding of it."""
    from igdm_tpu.models import autoencoder, unet4
    from igdm_tpu.sampling.latent import make_latent_sampler, sample_latent

    cfg = DiffusionConfig(num_steps=6)
    dp = unet4.init(jax.random.PRNGKey(0), in_channels=4, base_ch=8, levels=2)
    ae = autoencoder.init(jax.random.PRNGKey(1), base_ch=8, latent_ch=4)
    key = jax.random.PRNGKey(2)

    for method in ("ancestral", "ddim"):
        ref = sample_latent(
            dp, ae, key, cfg=cfg, scale=2.0, num_images=2, latent_size=(4, 4),
            method=method, num_sample_steps=4,
        )
        fn = make_latent_sampler(
            dp, ae, cfg=cfg, scale=2.0, num_images=2, latent_size=(4, 4),
            method=method, num_sample_steps=4, compute_dtype=None,
        )
        np.testing.assert_allclose(
            np.asarray(fn(key)), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    ref = np.asarray(sample_latent(
        dp, ae, key, cfg=cfg, scale=2.0, num_images=2, latent_size=(4, 4),
        method="ancestral",
    ))
    fn16 = make_latent_sampler(
        dp, ae, cfg=cfg, scale=2.0, num_images=2, latent_size=(4, 4),
        method="ancestral", compute_dtype=jnp.bfloat16,
    )
    out16 = np.asarray(fn16(key))
    assert out16.shape == ref.shape and np.isfinite(out16).all()
    scale_mag = np.max(np.abs(ref)) + 1e-6
    assert np.max(np.abs(out16 - ref)) / scale_mag < 0.05


def test_sample_latent_decode_requires_scale():
    """decode=True without the checkpoint's LDM scale_factor must hard-fail
    (a silent 1.0 default decoded mis-scaled latents — round-4 advisor)."""
    from igdm_tpu.models import autoencoder, unet4
    from igdm_tpu.sampling.latent import sample_latent

    dp = unet4.init(jax.random.PRNGKey(0), in_channels=4, base_ch=8, levels=2)
    ae = autoencoder.init(jax.random.PRNGKey(1), base_ch=8, latent_ch=4)
    with pytest.raises(ValueError, match="scale"):
        sample_latent(dp, ae, jax.random.PRNGKey(2), num_images=1,
                      latent_size=(4, 4))
    # decode=False stays scale-free (the dispatcher's contract)
    z = sample_latent(dp, ae, jax.random.PRNGKey(2), num_images=1,
                      latent_size=(4, 4), decode=False,
                      cfg=DiffusionConfig(num_steps=4), num_sample_steps=2)
    assert z.shape == (1, 4, 4, 4)


def test_latent_sampler_is_clip_free():
    """The latent scan must NOT clamp x0 to [-1,1]: with a zero-eps model
    and large-magnitude init, DDIM's x0 estimate is x_T/sqrt(ab_T) —
    outside [-1,1]; the clip-free step must preserve magnitudes > 1."""
    from igdm_tpu.diffusion.processes import ddim_step

    x_t = jnp.full((1, 2, 2, 1), 3.0)
    eps = jnp.zeros_like(x_t)
    out_free = ddim_step(x_t, eps, jnp.asarray(0.25), jnp.asarray(1.0), clip_x0=False)
    out_clip = ddim_step(x_t, eps, jnp.asarray(0.25), jnp.asarray(1.0), clip_x0=True)
    # x0 = 3/0.5 = 6 -> free output 6, clipped output 1
    np.testing.assert_allclose(np.asarray(out_free), 6.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_clip), 1.0, rtol=1e-6)


@pytest.mark.slow
def test_cli_train_latent(tmp_path, monkeypatch):
    """igdm-train --model latent end to end (AE + latent DDPM) then sample."""
    from igdm_tpu.cli.sample import main as sample_main
    from igdm_tpu.cli.train import main as train_main

    monkeypatch.chdir(tmp_path)
    rc = train_main([
        "--model", "latent", "--epochs", "2", "--timesteps", "8",
        "--batch-size", "100", "--base-ch", "8", "--ae-epochs", "3",
        "--patience", "100", "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    ckpt = tmp_path / "latent_model.npz"
    assert ckpt.is_file() and (tmp_path / "ae_model.npz").is_file()
    rc = sample_main([
        str(ckpt), "2", "--ddim-steps", "4", "--out", str(tmp_path / "lat.png"),
    ])
    assert rc == 0
    assert (tmp_path / "lat.png").is_file()


@pytest.mark.slow
def test_cli_train_latent_flow_and_reflow(tmp_path, monkeypatch):
    """The recommended serving stack (latent flow -> reflow-1) end to end
    from the CLI alone: igdm-train --model flow --ae trains the VAE (absent
    path) + latent flow; igdm-train --model reflow --teacher completes the
    1-call student; igdm-sample serves it (round-4 VERDICT task 3)."""
    from igdm_tpu.cli.sample import main as sample_main
    from igdm_tpu.cli.train import main as train_main

    monkeypatch.chdir(tmp_path)
    rc = train_main([
        "--model", "flow", "--epochs", "2", "--batch-size", "100",
        "--base-ch", "8", "--ae", str(tmp_path / "ae.npz"),
        "--ae-epochs", "3", "--patience", "100", "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    teacher = tmp_path / "latent_flow_model.npz"
    assert teacher.is_file() and (tmp_path / "ae.npz").is_file()

    rc = train_main([
        "--model", "reflow", "--teacher", str(teacher), "--epochs", "1",
        "--batch-size", "8", "--coupling-pairs", "16", "--coupling-steps", "4",
        "--patience", "100", "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    student = tmp_path / "reflow_model.npz"
    assert student.is_file()
    rc = sample_main([
        str(student), "2", "--steps", "1", "--out", str(tmp_path / "r1.png"),
    ])
    assert rc == 0
    assert (tmp_path / "r1.png").is_file()


def test_latent_checkpoint_portable_across_directories(tiny_imgs, tmp_path):
    """The ae_path rides as a basename and resolves NEXT TO the checkpoint,
    so a moved/cloned artifacts directory still samples (round-4 review)."""
    import shutil

    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.latent import train_autoencoder, train_latent_ddpm

    a = tmp_path / "a"
    a.mkdir()
    train_autoencoder(tiny_imgs, epochs=3, batch_size=8, base_ch=8, latent_ch=4,
                      out_path=str(a / "ae.npz"), log=None)
    _, ckpt = train_latent_ddpm(
        tiny_imgs, str(a / "ae.npz"), DiffusionConfig(num_steps=4),
        TrainConfig(batch_size=8, epochs=1, patience=50, checkpoint_every=0),
        base_ch=8, levels=2, out_dir=str(a), log=None,
    )
    b = tmp_path / "b"
    b.mkdir()
    shutil.move(ckpt, b / "latent_model.npz")
    shutil.move(str(a / "ae.npz"), b / "ae.npz")
    imgs01, info = sample_from_checkpoint(
        str(b / "latent_model.npz"), jax.random.PRNGKey(0), num_images=2,
        ddim_steps=2,
    )
    assert info["sampler"] == "latent-ddim" and imgs01.shape == (2, 16, 16)


def test_latent_rejects_unsupported_samplers(tiny_imgs, tmp_path):
    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.latent import train_autoencoder, train_latent_ddpm

    train_autoencoder(tiny_imgs, epochs=2, batch_size=8, base_ch=8, latent_ch=4,
                      out_path=str(tmp_path / "ae.npz"), log=None)
    _, ckpt = train_latent_ddpm(
        tiny_imgs, str(tmp_path / "ae.npz"), DiffusionConfig(num_steps=4),
        TrainConfig(batch_size=8, epochs=1, patience=50, checkpoint_every=0),
        base_ch=8, levels=2, out_dir=str(tmp_path), log=None,
    )
    with pytest.raises(ValueError, match="latent"):
        sample_from_checkpoint(ckpt, jax.random.PRNGKey(0), num_images=2,
                               sampler="dpmpp")


def test_unet4_attn_levels_out_of_range_raises():
    from igdm_tpu.models import unet4

    with pytest.raises(ValueError, match="attn_levels"):
        unet4.init(jax.random.PRNGKey(0), base_ch=8, attn_levels=(5,))


def test_latent_consistency_model_end_to_end(tiny_imgs, tmp_path):
    """LCM composition: consistency-distill a LATENT teacher — pixels get
    encoded with the teacher's VAE, distillation runs in latent space, and
    the student samples in ONE model call + decode through the dispatcher."""
    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.consistency import consistency_distill_checkpoint
    from igdm_tpu.training.latent import train_autoencoder, train_latent_ddpm

    train_autoencoder(tiny_imgs, epochs=3, batch_size=8, base_ch=8, latent_ch=4,
                      out_path=str(tmp_path / "ae.npz"), log=None)
    _, teacher = train_latent_ddpm(
        tiny_imgs, str(tmp_path / "ae.npz"), DiffusionConfig(num_steps=32),
        TrainConfig(batch_size=8, epochs=1, patience=50, checkpoint_every=0),
        base_ch=8, levels=2, out_dir=str(tmp_path), log=None,
    )
    out_path, student, grid, losses = consistency_distill_checkpoint(
        teacher, tiny_imgs, n_grid=4, steps=20, batch_size=8,
        compute_dtype=None, out_path=str(tmp_path / "lcm.npz"), log=None,
    )
    assert np.isfinite(losses).all()

    imgs01, info = sample_from_checkpoint(
        str(tmp_path / "lcm.npz"), jax.random.PRNGKey(0), num_images=3
    )
    assert info["sampler"] == "latent-consistency" and info["T"] == 1
    assert imgs01.shape == (3, 16, 16)
    assert np.isfinite(imgs01).all()
    # multistep override reaches 2-call refinement through the same entry
    imgs2, info2 = sample_from_checkpoint(
        str(tmp_path / "lcm.npz"), jax.random.PRNGKey(0), num_images=2, steps=2
    )
    assert info2["T"] == 2 and imgs2.shape == (2, 16, 16)


def test_conditional_latent_diffusion_end_to_end(tiny_imgs, tmp_path):
    """Conditional LDM composition (the Stable-Diffusion shape): VAE +
    class-conditional latent DDPM + guided clip-free CFG sampling + decode,
    all through the dispatcher with --label/--guidance semantics."""
    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.latent import train_autoencoder, train_latent_conditional

    labels = np.arange(len(tiny_imgs)) % 3
    train_autoencoder(tiny_imgs, epochs=3, batch_size=8, base_ch=8, latent_ch=4,
                      out_path=str(tmp_path / "ae.npz"), log=None)
    res, ckpt = train_latent_conditional(
        tiny_imgs, labels, 3, str(tmp_path / "ae.npz"),
        DiffusionConfig(num_steps=8),
        TrainConfig(batch_size=8, epochs=2, patience=50),
        base_ch=8, levels=2, out_dir=str(tmp_path), log=None,
    )
    assert np.isfinite(res.losses).all()

    imgs01, info = sample_from_checkpoint(
        ckpt, jax.random.PRNGKey(0), num_images=3, label=1,
        guidance_scale=1.5, ddim_steps=4,
    )
    assert info["sampler"] == "latent-cfg"
    assert imgs01.shape == (3, 16, 16)
    assert np.isfinite(imgs01).all()
    assert imgs01.min() >= 0.0 and imgs01.max() <= 1.0
    # a different guidance scale changes the output (the CFG mix is live)
    imgs01b, _ = sample_from_checkpoint(
        ckpt, jax.random.PRNGKey(0), num_images=3, label=1,
        guidance_scale=6.0, ddim_steps=4,
    )
    assert not np.allclose(imgs01, imgs01b)


def test_latent_flow_and_reflow_end_to_end(tiny_imgs, tmp_path):
    """Flow matching in latent space + reflow of the latent teacher: both
    dispatch as latent-flow (ODE in latent space, decode) and the reflow
    student keeps the VAE metadata."""
    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.flow import train_reflow
    from igdm_tpu.training.latent import train_autoencoder, train_latent_flow

    train_autoencoder(tiny_imgs, epochs=3, batch_size=8, base_ch=8, latent_ch=4,
                      out_path=str(tmp_path / "ae.npz"), log=None)
    res, ckpt = train_latent_flow(
        tiny_imgs, str(tmp_path / "ae.npz"),
        TrainConfig(batch_size=8, epochs=2, patience=50),
        base_ch=8, levels=2, out_dir=str(tmp_path), log=None,
    )
    assert np.isfinite(res.losses).all()
    imgs01, info = sample_from_checkpoint(
        ckpt, jax.random.PRNGKey(0), num_images=3, ddim_steps=4)
    assert info["sampler"] == "latent-flow-euler"
    assert imgs01.shape == (3, 16, 16) and np.isfinite(imgs01).all()

    rres = train_reflow(
        ckpt, TrainConfig(batch_size=8, epochs=1, patience=50),
        num_pairs=16, coupling_steps=4, out_dir=str(tmp_path),
        save_final="latent_reflow", log=None,
    )
    assert np.isfinite(rres.losses).all()
    imgs1, info1 = sample_from_checkpoint(
        str(tmp_path / "latent_reflow.npz"), jax.random.PRNGKey(0),
        num_images=2, ddim_steps=1)
    assert info1["sampler"] == "latent-flow-euler" and info1["T"] == 1
    assert imgs1.shape == (2, 16, 16) and np.isfinite(imgs1).all()


def test_latent_flow_steps_kwarg_reaches_ode(tiny_imgs, tmp_path):
    """`steps=1` (the consistency families' knob) selects a 1-step ODE for
    flow checkpoints too — the documented 1-call reflow operating point
    must be reachable via either kwarg (round-4 review)."""
    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.latent import train_autoencoder, train_latent_flow

    train_autoencoder(tiny_imgs, epochs=2, batch_size=8, base_ch=8, latent_ch=4,
                      out_path=str(tmp_path / "ae.npz"), log=None)
    _, ckpt = train_latent_flow(
        tiny_imgs, str(tmp_path / "ae.npz"),
        TrainConfig(batch_size=8, epochs=1, patience=50),
        base_ch=8, levels=2, out_dir=str(tmp_path), log=None,
    )
    _, info = sample_from_checkpoint(ckpt, jax.random.PRNGKey(0),
                                     num_images=2, steps=1)
    assert info["T"] == 1
    _, info2 = sample_from_checkpoint(ckpt, jax.random.PRNGKey(0),
                                      num_images=2, ddim_steps=3)
    assert info2["T"] == 3


def test_latent_method_validation_and_missing_scale_guard():
    """Round-5 review: (a) a flow-style method name must hard-fail instead
    of silently mixing a DDIM sub-grid with the ancestral update; (b) a
    latent checkpoint metadata block lacking 'scale' must be loud in the
    dispatcher's decode epilogue."""
    from igdm_tpu.models import autoencoder, unet4
    from igdm_tpu.sampling.auto import _lmeta_scale
    from igdm_tpu.sampling.latent import make_latent_sampler, sample_latent

    dp = unet4.init(jax.random.PRNGKey(0), in_channels=4, base_ch=8, levels=2)
    ae = autoencoder.init(jax.random.PRNGKey(1), base_ch=8, latent_ch=4)
    with pytest.raises(ValueError, match="method"):
        make_latent_sampler(dp, ae, scale=1.0, num_images=1,
                            latent_size=(4, 4), method="euler")
    with pytest.raises(ValueError, match="method"):
        sample_latent(dp, ae, jax.random.PRNGKey(0), scale=1.0, num_images=1,
                      latent_size=(4, 4), method="euler")

    assert _lmeta_scale({"scale": 2.5}) == 2.5
    with pytest.raises(ValueError, match="scale"):
        _lmeta_scale({"ae_path": "ae.npz"})


def test_nn_panel_pads_ragged_chunks(tmp_path):
    """k not a multiple of the panel width must keep sample/neighbor rows
    vertically aligned (blank-padded), not shifted (round-5 review)."""
    from igdm_tpu.utils.quality import nn_panel

    rng = np.random.default_rng(0)
    data = rng.uniform(0, 1, (30, 8, 8)).astype(np.float32)
    samples = data[:12] + 0.01
    out = str(tmp_path / "ragged.png")
    pairs = nn_panel(samples, data, out, k=12)
    assert (tmp_path / "ragged.png").is_file()
    assert len(pairs) == 12
    for i, j, _ in pairs:
        assert j == i


def test_ddim_eta1_equals_textbook_posterior_on_adjacent_steps():
    """Algebra pin: for adjacent timesteps the stochastic-DDIM sigma
    (eta=1) equals the textbook posterior std AND the deterministic part
    reduces to the posterior mean, so ddim_step(eta=1, noise) ==
    ddpm_posterior_step(same noise) exactly (Song et al. 2020, eq. 16)."""
    from igdm_tpu.diffusion.processes import ddim_step, ddpm_posterior_step

    rng = np.random.default_rng(0)
    x_t = jnp.asarray(rng.normal(0, 1.5, (2, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.normal(0, 1, x_t.shape).astype(np.float32))
    nz = jnp.asarray(rng.normal(0, 1, x_t.shape).astype(np.float32))
    ab_prev, ab_t = 0.71, 0.63  # adjacent: beta_t = 1 - ab_t/ab_prev
    beta_t = 1.0 - ab_t / ab_prev
    out_ddim = ddim_step(
        x_t, eps, jnp.float32(ab_t), jnp.float32(ab_prev), eta=1.0, noise=nz,
        clip_x0=False,
    )
    out_post = ddpm_posterior_step(
        x_t, eps, nz, jnp.float32(beta_t), jnp.float32(ab_t),
        jnp.float32(ab_prev), clip_x0=False,
    )
    np.testing.assert_allclose(np.asarray(out_ddim), np.asarray(out_post),
                               rtol=2e-5, atol=2e-5)


def test_latent_ddim_eta_changes_samples_and_stays_finite():
    """eta plumbs through sample_latent/make_latent_sampler: eta=1 output
    differs from eta=0 on the same key, both finite; eta=0 unchanged vs
    the default (the deterministic path is untouched)."""
    from igdm_tpu.models import autoencoder, unet4
    from igdm_tpu.sampling.latent import make_latent_sampler, sample_latent

    cfg = DiffusionConfig(num_steps=8)
    dp = unet4.init(jax.random.PRNGKey(0), in_channels=4, base_ch=8, levels=2)
    ae = autoencoder.init(jax.random.PRNGKey(1), base_ch=8, latent_ch=4)
    key = jax.random.PRNGKey(3)
    kw = dict(cfg=cfg, scale=2.0, num_images=2, latent_size=(4, 4),
              method="ddim", num_sample_steps=4)
    base = np.asarray(sample_latent(dp, ae, key, **kw))
    same = np.asarray(sample_latent(dp, ae, key, eta=0.0, **kw))
    np.testing.assert_array_equal(base, same)
    stoch = np.asarray(sample_latent(dp, ae, key, eta=1.0, **kw))
    assert np.isfinite(stoch).all() and not np.allclose(stoch, base)
    fn = make_latent_sampler(dp, ae, eta=1.0, compute_dtype=None, **kw)
    np.testing.assert_allclose(np.asarray(fn(key)), stoch, rtol=2e-5, atol=2e-5)


def test_dispatcher_rejects_eta_on_non_ddim_samplers(tiny_imgs, tmp_path):
    """--eta on a sampler that cannot honor it must hard-fail — silently
    ignoring it made eta sweeps meaningless (round-5 review)."""
    from igdm_tpu.sampling.auto import sample_from_checkpoint
    from igdm_tpu.training.latent import train_autoencoder, train_latent_ddpm

    train_autoencoder(tiny_imgs, epochs=2, batch_size=8, base_ch=8, latent_ch=4,
                      out_path=str(tmp_path / "ae.npz"), log=None)
    _, ckpt = train_latent_ddpm(
        tiny_imgs, str(tmp_path / "ae.npz"), DiffusionConfig(num_steps=4),
        TrainConfig(batch_size=8, epochs=1, patience=50, checkpoint_every=0),
        base_ch=8, levels=2, out_dir=str(tmp_path), log=None,
    )
    with pytest.raises(ValueError, match="eta"):
        sample_from_checkpoint(ckpt, jax.random.PRNGKey(0), num_images=1,
                               sampler="textbook", eta=1.0)
    # the ddim path accepts it
    imgs, _ = sample_from_checkpoint(ckpt, jax.random.PRNGKey(0), num_images=1,
                                     ddim_steps=2, eta=1.0)
    assert np.isfinite(imgs).all()
