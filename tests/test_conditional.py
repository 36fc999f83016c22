"""Class-conditional training + classifier-free guidance
(models/unet4 num_classes, training/conditional, sampling/guided)."""

import numpy as np
import jax
import jax.numpy as jnp

from igdm_tpu.config import DiffusionConfig, TrainConfig


def test_conditional_init_is_identity():
    """The class-embedding table is zero-initialized, so at init a
    conditional model computes exactly the unconditional function for
    every label (and for the NULL token)."""
    from igdm_tpu.models import unet4

    key = jax.random.PRNGKey(0)
    p_uncond = unet4.init(key, base_ch=8)
    p_cond = unet4.init(key, base_ch=8, num_classes=5)
    assert p_cond["class_emb"]["table"].shape == (6, 128)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1), jnp.float32)
    ts = jnp.asarray([1, 3, 5, 7])
    ref = unet4.apply(p_uncond, x, ts, final_sigmoid=False)
    for labels in (None, jnp.asarray([0, 1, 2, 4])):
        out = unet4.apply(p_cond, x, ts, final_sigmoid=False, labels=labels)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_kmeans_labels_deterministic_and_covering():
    from igdm_tpu.data.labels import kmeans_labels

    rng = np.random.default_rng(0)
    # three well-separated blobs in image space
    imgs = np.concatenate([
        rng.normal(loc, 0.05, (30, 16, 16, 1)) for loc in (-1.0, 0.0, 1.0)
    ]).astype(np.float32)
    a = kmeans_labels(imgs, k=3, seed=0)
    b = kmeans_labels(imgs, k=3, seed=0)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (90,) and set(a.tolist()) == {0, 1, 2}
    # each blob lands in one cluster
    for s in range(3):
        assert len(set(a[30 * s : 30 * (s + 1)].tolist())) == 1


def test_train_conditional_smoke(tmp_path):
    """Tiny conditional run: losses finite and falling, checkpoint metadata
    records the guidance setup."""
    import json

    from igdm_tpu.training.conditional import train_conditional_ddpm

    rng = np.random.default_rng(1)
    imgs = rng.uniform(-1, 1, (32, 16, 16, 1)).astype(np.float32)
    labels = (np.arange(32) % 4).astype(np.int32)
    res = train_conditional_ddpm(
        imgs, labels, num_classes=4,
        diff_cfg=DiffusionConfig(num_steps=8),
        train_cfg=TrainConfig(epochs=8, batch_size=8, patience=100),
        base_ch=8, out_dir=str(tmp_path), log=None,
    )
    assert np.isfinite(res.losses).all()
    assert np.mean(res.losses[-3:]) < np.mean(res.losses[:3])
    with np.load(res.checkpoints[0]) as z:
        meta = json.loads(bytes(z["__meta__"]))
    assert meta["conditional"] == {"num_classes": 4, "drop_prob": 0.1}


def test_sample_cfg_matches_unguided_at_zero_table():
    """With the zero-init table cond == uncond, so guided sampling at ANY
    scale must equal plain unguided DDIM on the same network — pins the
    doubled-batch plumbing, the eps mixing, and the shared RNG layout."""
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.ancestral import sample_ddim
    from igdm_tpu.sampling.guided import sample_cfg

    cfg = DiffusionConfig(num_steps=16)
    params = unet4.init(jax.random.PRNGKey(0), base_ch=8, num_classes=3)
    key = jax.random.PRNGKey(2)
    ref = sample_ddim(
        params, {}, key, num_images=3, image_size=(16, 16), cfg=cfg,
        num_sample_steps=8, model_kind="unet4",
    )
    for scale in (0.0, 1.0, 4.0):
        out = sample_cfg(
            params, key, jnp.asarray([0, 1, 2]), guidance_scale=scale,
            cfg=cfg, num_sample_steps=8, image_size=(16, 16),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conditional_checkpoint_auto_dispatch(tmp_path):
    """A checkpoint carrying meta['conditional'] dispatches to guided
    sampling through sampling.auto (the CLI path), honoring --label."""
    import json

    from igdm_tpu.checkpoint.pytree_io import _flatten_with_paths
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.auto import sample_from_checkpoint

    params = unet4.init(jax.random.PRNGKey(0), base_ch=8, num_classes=4)
    payload = {
        f"params/{k}": np.asarray(v) for k, v in _flatten_with_paths(params).items()
    }
    meta = {
        "model": "unet4",
        "diff_cfg": {"num_steps": 16},
        "conditional": {"num_classes": 4, "drop_prob": 0.1},
    }
    payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    path = str(tmp_path / "cond.npz")
    np.savez(path, **payload)
    imgs01, info = sample_from_checkpoint(
        path, jax.random.PRNGKey(1), num_images=4, ddim_steps=8,
    )
    assert info["sampler"] == "cfg" and info["labels"] == [0, 1, 2, 3]
    assert imgs01.shape == (4, 32, 32) and np.isfinite(imgs01).all()
    _, info2 = sample_from_checkpoint(
        path, jax.random.PRNGKey(1), num_images=3, ddim_steps=8, label=2,
        guidance_scale=3.0,
    )
    assert info2["labels"] == [2, 2, 2] and info2["guidance_scale"] == 3.0


def test_sample_cfg_guidance_moves_output():
    """With a non-zero class embedding, different labels and different
    guidance scales must produce different images."""
    from igdm_tpu.models import unet4
    from igdm_tpu.sampling.guided import sample_cfg

    cfg = DiffusionConfig(num_steps=16)
    params = unet4.init(jax.random.PRNGKey(0), base_ch=8, num_classes=3)
    params["class_emb"]["table"] = jax.random.normal(
        jax.random.PRNGKey(9), params["class_emb"]["table"].shape
    )
    key = jax.random.PRNGKey(3)
    kw = dict(cfg=cfg, num_sample_steps=8, image_size=(16, 16))
    a = sample_cfg(params, key, jnp.asarray([0, 0]), guidance_scale=1.0, **kw)
    b = sample_cfg(params, key, jnp.asarray([1, 1]), guidance_scale=1.0, **kw)
    c = sample_cfg(params, key, jnp.asarray([0, 0]), guidance_scale=4.0, **kw)
    assert float(jnp.abs(a - b).max()) > 1e-4  # label matters
    assert float(jnp.abs(a - c).max()) > 1e-4  # scale matters
