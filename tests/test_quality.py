"""Sample-quality metric tests."""

import numpy as np
import pytest

from igdm_tpu.utils.quality import coverage, evaluate_samples, nn_mse, pairwise_diversity


def test_nn_mse_zero_for_dataset_members():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((50, 64)).astype(np.float32)
    assert nn_mse(data[:10], data) < 1e-6


def test_nn_mse_positive_for_noise():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((50, 64)).astype(np.float32)
    noise = rng.standard_normal((10, 64)).astype(np.float32) * 10
    assert nn_mse(noise, data) > 1.0


def test_coverage_bounds():
    rng = np.random.default_rng(2)
    data = rng.standard_normal((20, 16)).astype(np.float32)
    # samples identical to one datum -> coverage 1/20
    samples = np.repeat(data[:1], 8, axis=0)
    assert abs(coverage(samples, data) - 1 / 20) < 1e-9
    # distinct members -> higher coverage
    assert coverage(data[:8], data) == 8 / 20


def test_pairwise_diversity_collapse_detection():
    rng = np.random.default_rng(3)
    collapsed = np.repeat(rng.standard_normal((1, 32)).astype(np.float32), 6, axis=0)
    diverse = rng.standard_normal((6, 32)).astype(np.float32)
    assert pairwise_diversity(collapsed) < 1e-6
    assert pairwise_diversity(diverse) > 0.5


def test_evaluate_samples_keys():
    rng = np.random.default_rng(4)
    data = rng.standard_normal((30, 16)).astype(np.float32)
    m = evaluate_samples(data[:5], data)
    assert set(m) == {"nn_mse", "coverage", "pairwise_diversity", "n_samples"}


def test_evaluate_sampler_error_bars():
    """Seeds-aware protocol: per-seed reports + mean/std aggregation, and
    the sampler receives distinct keys across seeds and chunks."""
    import jax

    from igdm_tpu.utils.quality import METRICS, evaluate_sampler

    rng = np.random.default_rng(0)
    data = rng.uniform(0, 1, (40, 8, 8)).astype(np.float32)
    seen = []

    def sample_fn(key, n):
        seen.append(tuple(np.asarray(jax.random.key_data(key)).tolist()))
        k = int(np.asarray(jax.random.key_data(key)).astype(np.int64).sum() % 7)
        return data[(np.arange(n) + k) % len(data)] + rng.normal(0, 0.01, (n, 8, 8)).astype(np.float32)

    rep = evaluate_sampler(sample_fn, data, n_samples=24, seeds=(0, 1, 2), batch=10)
    assert rep["n_samples"] == 24 and len(rep["per_seed"]) == 3
    assert len(seen) == len(set(seen)) == 9  # 3 seeds x 3 chunks, all distinct
    for m in METRICS:
        assert set(rep[m]) == {"mean", "std"}
        per = [p[m] for p in rep["per_seed"]]
        assert rep[m]["mean"] == pytest.approx(float(np.mean(per)))
        assert rep[m]["std"] == pytest.approx(float(np.std(per)))
    assert rep["nn_mse"]["mean"] < 0.01  # near-copies of the data


def test_quality_cli_on_checkpoint(tmp_path, monkeypatch, capsys):
    """python -m igdm_tpu.utils.quality end-to-end on a tiny checkpoint."""
    import json

    from igdm_tpu.training.ddpm import train_ddpm
    from igdm_tpu.config import DiffusionConfig, TrainConfig
    from igdm_tpu.utils.quality import _main

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (32, 32, 32, 1)).astype(np.float32)
    train_ddpm(
        imgs, DiffusionConfig(num_steps=5),
        TrainConfig(batch_size=16, epochs=1, patience=50, checkpoint_every=0),
        out_dir=str(tmp_path), log=None,
    )
    rc = _main([
        str(tmp_path / "trained_model.npz"),
        "--n-samples", "8", "--seeds", "0", "1", "--batch", "4",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_samples"] == 8 and len(rep["per_seed"]) == 2
    assert "mean" in rep["nn_mse"] and "std" in rep["nn_mse"]


def test_quality_cli_upscales_reference_for_64px_checkpoints(tmp_path, capsys):
    """A 64x64 checkpoint scores against the 2x-upscaled dataset (the
    stretch protocol) instead of crashing on a shape mismatch."""
    import json

    from igdm_tpu.config import DiffusionConfig, TrainConfig
    from igdm_tpu.training.ddpm import train_ddpm
    from igdm_tpu.utils.quality import _main

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (32, 64, 64, 1)).astype(np.float32)
    train_ddpm(
        imgs, DiffusionConfig(num_steps=5),
        TrainConfig(batch_size=16, epochs=1, patience=50, checkpoint_every=0),
        out_dir=str(tmp_path), model_kind="unet4", base_ch=8, log=None,
    )
    rc = _main([
        str(tmp_path / "trained_model.npz"),
        "--n-samples", "4", "--seeds", "0", "--batch", "4", "--ddim-steps", "2",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_samples"] == 4 and np.isfinite(rep["nn_mse"]["mean"])


def test_guided_purity_protocol():
    """class_purity + the seeds-aware guided protocol: a sampler that
    returns class-pure near-copies scores ~1.0; a label-blind one scores
    ~chance."""
    import jax

    from igdm_tpu.utils.quality import evaluate_guided_purity

    rng = np.random.default_rng(0)
    K = 4
    data = rng.uniform(0, 1, (40, 8, 8)).astype(np.float32)
    # make classes linearly separable: shift each class's images
    labels = np.arange(40) % K
    data = data + labels[:, None, None] * 2.0

    def pure_fn(key, want):
        idx = np.array([np.where(labels == w)[0][0] for w in want])
        return data[idx] + rng.normal(0, 0.01, (len(want), 8, 8)).astype(np.float32)

    rep = evaluate_guided_purity(pure_fn, data, labels, n_samples=24,
                                 seeds=(0, 1), batch=12)
    assert rep["mean"] > 0.95 and rep["chance"] == pytest.approx(0.25)
    assert len(rep["per_seed"]) == 2

    def blind_fn(key, want):
        return data[rng.integers(0, 40, len(want))]

    rep_b = evaluate_guided_purity(blind_fn, data, labels, n_samples=24,
                                   seeds=(0, 1), batch=12)
    assert rep_b["mean"] < 0.6


def test_guided_purity_non_contiguous_labels():
    """Label sets like {1,2,4} must cycle only over EXISTING classes and
    report chance = 1/3 (round-4 review: max+1 requested empty classes)."""
    import jax

    from igdm_tpu.utils.quality import evaluate_guided_purity

    rng = np.random.default_rng(0)
    labels = np.array([1, 2, 4] * 10)
    data = rng.uniform(0, 1, (30, 8, 8)).astype(np.float32) + labels[:, None, None] * 2.0

    seen_wants = []

    def fn(key, want):
        seen_wants.append(np.asarray(want))
        idx = np.array([np.where(labels == w)[0][0] for w in want])
        return data[idx]

    rep = evaluate_guided_purity(fn, data, labels, n_samples=12, seeds=(0,), batch=6)
    assert rep["chance"] == pytest.approx(1.0 / 3.0)
    assert set(np.concatenate(seen_wants).tolist()) == {1, 2, 4}
    assert rep["mean"] > 0.95


def test_holdout_split_deterministic_partition():
    from igdm_tpu.utils.quality import holdout_split

    tr, ho = holdout_split(500, 50, seed=0)
    tr2, ho2 = holdout_split(500, 50, seed=0)
    np.testing.assert_array_equal(tr, tr2)
    np.testing.assert_array_equal(ho, ho2)
    assert len(tr) == 450 and len(ho) == 50
    assert len(np.intersect1d(tr, ho)) == 0
    assert len(np.union1d(tr, ho)) == 500
    tr3, _ = holdout_split(500, 50, seed=1)
    assert not np.array_equal(tr, tr3)


def test_evaluate_generalization_separates_copier_from_generalizer():
    """A sampler that replays TRAIN images shows nn_mse(train) far below the
    data floor and a large holdout gap; a sampler drawing fresh
    in-distribution data sits at the floor with a small gap — the
    quantitative memorization signature the protocol exists to detect."""
    import jax

    from igdm_tpu.utils.quality import evaluate_generalization, holdout_split

    rng = np.random.default_rng(0)
    # low-dim structured data so in-distribution neighbors are close
    basis = rng.normal(0, 1, (3, 8, 8)).astype(np.float32)
    coef = rng.normal(0, 1, (120, 3)).astype(np.float32)
    data = np.tensordot(coef, basis, axes=1)
    tr_idx, _ = holdout_split(120, 20, 0)
    train_set = data[tr_idx]

    def copier(key, n):
        return train_set[rng.integers(0, len(train_set), n)]

    def generalizer(key, n):
        c = rng.normal(0, 1, (n, 3)).astype(np.float32)
        return np.tensordot(c, basis, axes=1)

    rep_c = evaluate_generalization(copier, data, n_holdout=20, n_samples=32,
                                    seeds=(0, 1), batch=16)
    rep_g = evaluate_generalization(generalizer, data, n_holdout=20,
                                    n_samples=32, seeds=(0, 1), batch=16)
    floor = rep_c["data_floor"]
    assert rep_c["train_nn_mse"]["mean"] < 0.1 * floor          # copier: on train
    # gap alone is inflated for everyone (20 holdout candidates vs 100 train
    # ones); the copier's is still clearly larger
    assert rep_c["gap"]["mean"] > 1.5 * rep_g["gap"]["mean"]
    assert rep_g["train_nn_mse"]["mean"] > 0.3 * floor          # generalizer: near floor
    assert rep_c["data_floor"] == rep_g["data_floor"] > 0.0


def test_nn_panel_writes_png(tmp_path):
    from igdm_tpu.utils.quality import nn_panel

    rng = np.random.default_rng(0)
    data = rng.uniform(0, 1, (40, 8, 8)).astype(np.float32)
    samples = data[:10] + 0.01  # near-copies: NN should be identity
    out = str(tmp_path / "panel.png")
    pairs = nn_panel(samples, data, out, k=8)
    assert (tmp_path / "panel.png").is_file()
    assert len(pairs) == 8
    for i, j, dist in pairs:
        assert j == i and dist >= 0.0  # sample i's neighbor is data i
