"""Sample-quality metric tests."""

import numpy as np

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
