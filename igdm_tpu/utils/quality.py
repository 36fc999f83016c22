"""Sample-quality metrics.

The reference ships no quality measurement (BASELINE.md: no published
numbers). These are lightweight, dependency-free metrics suited to a
500-image dataset:

* nn_mse — mean MSE from each sample to its nearest dataset neighbor
  (fidelity; lower is better). Computed as one (N_s, N_d) distance matrix on
  device — a single MXU matmul via the ||a-b||^2 expansion.
* coverage — fraction of dataset images that are the nearest neighbor of at
  least one sample (mode coverage; higher is better).
* pairwise_diversity — mean pairwise MSE among the samples themselves
  (collapse detection; ~2x dataset variance is healthy).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _sq_dists(a, b):
    """(Na, Nb) squared L2 distances via the matmul expansion (clamped at 0:
    the expansion goes slightly negative for near-identical vectors, which
    would leak negative nn_mse and unstable duplicate ties)."""
    a = jnp.asarray(a.reshape(a.shape[0], -1), jnp.float32)
    b = jnp.asarray(b.reshape(b.shape[0], -1), jnp.float32)
    aa = jnp.sum(a * a, axis=1, keepdims=True)
    bb = jnp.sum(b * b, axis=1, keepdims=True)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(aa + bb.T - 2.0 * ab, 0.0)


def nn_mse(samples: np.ndarray, dataset: np.ndarray) -> float:
    """Mean nearest-neighbor MSE (per pixel) from samples to the dataset."""
    d = _sq_dists(np.asarray(samples), np.asarray(dataset))
    per_pixel = jnp.min(d, axis=1) / samples.reshape(samples.shape[0], -1).shape[1]
    return float(jnp.mean(per_pixel))


def coverage(samples: np.ndarray, dataset: np.ndarray) -> float:
    """Fraction of dataset images claimed as a nearest neighbor by samples."""
    d = _sq_dists(np.asarray(samples), np.asarray(dataset))
    nn = jnp.argmin(d, axis=1)
    return float(jnp.unique(nn).size / dataset.shape[0])


def pairwise_diversity(samples: np.ndarray) -> float:
    """Mean pairwise per-pixel MSE among samples (0 = total mode collapse)."""
    n = samples.shape[0]
    d = _sq_dists(np.asarray(samples), np.asarray(samples))
    off = jnp.sum(d) / (n * (n - 1))
    return float(off / samples.reshape(n, -1).shape[1])


def evaluate_samples(samples: np.ndarray, dataset: np.ndarray) -> dict:
    return {
        "nn_mse": nn_mse(samples, dataset),
        "coverage": coverage(samples, dataset),
        "pairwise_diversity": pairwise_diversity(samples),
        "n_samples": int(samples.shape[0]),
    }


METRICS = ("nn_mse", "coverage", "pairwise_diversity")


def class_purity(samples, want_labels, dataset, dataset_labels) -> float:
    """Fraction of samples whose nearest dataset neighbor carries the
    REQUESTED class label — the guided-generation fidelity metric used by
    the CFG purity curves (BASELINE.md)."""
    d = _sq_dists(np.asarray(samples), np.asarray(dataset))
    nn = np.asarray(jnp.argmin(d, axis=1))
    return float(np.mean(np.asarray(dataset_labels)[nn] == np.asarray(want_labels)))


def evaluate_guided_purity(
    sample_fn,
    dataset: np.ndarray,
    dataset_labels: np.ndarray,
    *,
    n_samples: int = 512,
    seeds=(0, 1, 2),
    batch: int = 256,
) -> dict:
    """Seeds-aware CFG purity (the error-bar protocol for conditional
    models). ``sample_fn(key, want_labels) -> (n, H, W[, C])`` draws one
    guided sample per requested label; labels cycle over the classes."""
    import jax

    # cycle over the classes that actually EXIST in the dataset — max+1
    # would request empty classes (guaranteed-zero purity) and misstate
    # the chance baseline for non-contiguous label sets
    classes = np.unique(np.asarray(dataset_labels))
    per_seed = []
    for s in seeds:
        key = jax.random.PRNGKey(s)
        chunks, wants, done, i = [], [], 0, 0
        while done < n_samples:
            n = min(batch, n_samples - done)
            want = classes[np.arange(done, done + n) % len(classes)].astype(np.int32)
            chunks.append(np.asarray(sample_fn(jax.random.fold_in(key, i), want)))
            wants.append(want)
            done += n
            i += 1
        per_seed.append(class_purity(
            np.concatenate(chunks), np.concatenate(wants), dataset, dataset_labels
        ))
    vals = np.asarray(per_seed, np.float64)
    return {
        "mean": float(vals.mean()), "std": float(vals.std()),
        "per_seed": [float(v) for v in per_seed],
        "chance": 1.0 / len(classes), "n_samples": int(n_samples),
    }


def evaluate_sampler(
    sample_fn,
    dataset: np.ndarray,
    *,
    n_samples: int = 512,
    seeds=(0, 1, 2),
    batch: int = 256,
) -> dict:
    """Seeds-aware quality evaluation (round-4 error-bar protocol).

    ``sample_fn(key, n) -> (n, H, W[, C])`` draws n samples in the
    dataset's space. Each seed draws ``n_samples`` images (in ``batch``
    chunks off one PRNG stream) and is scored independently; the report
    carries mean ± population std across seeds per metric, so
    cross-family claims can be checked against sampling noise instead of
    resting on single-seed point estimates (round-3 verdict, Weak #5).
    """
    import jax

    per_seed = []
    for s in seeds:
        key = jax.random.PRNGKey(s)
        chunks, done, i = [], 0, 0
        while done < n_samples:
            n = min(batch, n_samples - done)
            chunks.append(np.asarray(sample_fn(jax.random.fold_in(key, i), n)))
            done += n
            i += 1
        per_seed.append(evaluate_samples(np.concatenate(chunks), dataset))

    report = {
        "n_samples": int(n_samples),
        "seeds": [int(s) for s in seeds],
        "per_seed": per_seed,
    }
    for m in METRICS:
        vals = np.asarray([p[m] for p in per_seed], np.float64)
        report[m] = {"mean": float(vals.mean()), "std": float(vals.std())}
    return report


def holdout_split(n: int, n_holdout: int = 50, seed: int = 0):
    """Deterministic (train_idx, holdout_idx) permutation split of range(n).

    The generalization protocol's contract: train a model on
    ``dataset[train_idx]`` only, then score its samples against BOTH splits
    (``evaluate_generalization``). Same (n, n_holdout, seed) always yields
    the same split, so the training CLI and the scoring CLI agree without
    sharing state."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    return np.sort(perm[n_holdout:]), np.sort(perm[:n_holdout])


def evaluate_generalization(
    sample_fn,
    dataset: np.ndarray,
    *,
    n_holdout: int = 50,
    split_seed: int = 0,
    n_samples: int = 512,
    seeds=(0, 1, 2),
    batch: int = 256,
) -> dict:
    """Memorization-vs-generalization report for a model TRAINED ON THE
    TRAIN SPLIT of ``holdout_split`` (round-4 VERDICT task 4).

    Reports, per seed and mean±std across seeds:

    * ``train.nn_mse`` / ``holdout.nn_mse`` — sample fidelity vs the split
      the model saw and the split it never saw;
    * ``gap`` = holdout.nn_mse − train.nn_mse — a pure copier's gap is
      large (samples sit on train images), a generalizer's is small;
    * ``data_floor`` — nn_mse of the REAL holdout images to the train
      split: how close a genuinely novel in-distribution image sits to the
      train set. ``train.nn_mse`` well BELOW this floor means the model is
      closer to its training images than fresh data ever is — the
      quantitative memorization signature; at or above it means the model
      emits novel in-distribution content.
    """
    import jax

    tr_idx, ho_idx = holdout_split(dataset.shape[0], n_holdout, split_seed)
    train_set, holdout_set = dataset[tr_idx], dataset[ho_idx]
    d_floor = nn_mse(holdout_set, train_set)

    per_seed = []
    for s in seeds:
        key = jax.random.PRNGKey(s)
        chunks, done, i = [], 0, 0
        while done < n_samples:
            n = min(batch, n_samples - done)
            chunks.append(np.asarray(sample_fn(jax.random.fold_in(key, i), n)))
            done += n
            i += 1
        samples = np.concatenate(chunks)
        row = {
            "train": evaluate_samples(samples, train_set),
            "holdout": evaluate_samples(samples, holdout_set),
        }
        row["gap"] = row["holdout"]["nn_mse"] - row["train"]["nn_mse"]
        per_seed.append(row)

    report = {
        "n_samples": int(n_samples),
        "seeds": [int(s) for s in seeds],
        "n_holdout": int(n_holdout),
        "split_seed": int(split_seed),
        "data_floor": float(d_floor),
        "per_seed": per_seed,
    }
    for split in ("train", "holdout"):
        for m in METRICS:
            vals = np.asarray([p[split][m] for p in per_seed], np.float64)
            report[f"{split}_{m}"] = {"mean": float(vals.mean()), "std": float(vals.std())}
    gaps = np.asarray([p["gap"] for p in per_seed], np.float64)
    report["gap"] = {"mean": float(gaps.mean()), "std": float(gaps.std())}
    return report


def nn_panel(samples: np.ndarray, dataset: np.ndarray, out_path: str, k: int = 16):
    """Save a visual nearest-neighbor panel: the k samples CLOSEST to any
    dataset image (the most memorization-suspicious ones), each next to its
    nearest neighbor — sample rows above, neighbor rows below. The eyeball
    check behind the holdout numbers."""
    from igdm_tpu.data.images import save_sample_grid

    d = np.asarray(_sq_dists(samples, dataset))
    best = d.min(axis=1)
    order = np.argsort(best)[:k]
    nn = d.argmin(axis=1)[order]
    # layout: a row of samples above the row of their neighbors, repeated.
    # A short final chunk is padded with blank tiles so the vertical
    # sample/neighbor pairing survives any k (a ragged chunk would shift
    # neighbors beside unrelated samples).
    ncols = min(8, len(order))
    blank = np.zeros_like(np.asarray(samples[0]))
    tiles = []
    for r0 in range(0, len(order), ncols):
        chunk = order[r0:r0 + ncols]
        pad = ncols - len(chunk)
        tiles.extend(np.asarray(samples[i]) for i in chunk)
        tiles.extend([blank] * pad)
        tiles.extend(np.asarray(dataset[j]) for j in nn[r0:r0 + ncols])
        tiles.extend([blank] * pad)
    save_sample_grid(np.stack(tiles), out_path, ncols=ncols,
                     title="samples (upper rows) vs nearest train image (lower)")
    return [(int(i), int(j), float(best[i])) for i, j in zip(order, nn)]


def _main(argv=None) -> int:
    """CLI: score a checkpoint with the error-bar protocol.

        python -m igdm_tpu.utils.quality ckpt.npz --n-samples 512 --seeds 0 1 2

    Samples through sampling.auto.sample_from_checkpoint (any checkpoint
    kind) and prints the mean±std report as JSON.
    """
    import argparse
    import json

    p = argparse.ArgumentParser(prog="igdm-quality", description=_main.__doc__)
    p.add_argument("checkpoint")
    p.add_argument("--data", default=None, help=".mat dataset (default: bundled)")
    p.add_argument("--n-samples", type=int, default=512)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--sampler", default="auto")
    p.add_argument("--ddim-steps", type=int, default=50)
    p.add_argument("--eta", type=float, default=0.0,
                   help="stochastic-DDIM noise scale (BASELINE.md eta study)")
    p.add_argument("--ema", action="store_true")
    p.add_argument(
        "--holdout", type=int, default=0,
        help="generalization protocol: score vs the train/holdout split of "
        "holdout_split(n, N, --holdout-seed) — the checkpoint must have "
        "been trained with igdm-train --holdout N (same seed)",
    )
    p.add_argument("--holdout-seed", type=int, default=0)
    p.add_argument(
        "--panel", default=None, metavar="PNG",
        help="also save a nearest-neighbor panel (the 16 most train-similar "
        "samples next to their nearest train image)",
    )
    args = p.parse_args(argv)

    import jax as _jax

    from igdm_tpu.data.mat import load_synthetic_images
    from igdm_tpu.sampling.auto import sample_from_checkpoint

    raw = load_synthetic_images(args.data)
    # Frame-matched dataset: samplers display images as
    # (clip(model_space, -1, 1)+1)/2 with model_space = normalize_pm1(raw)
    # = 2*raw-1, so the dataset must ride the SAME affine chain —
    # clip(raw, 0, 1). The previous (raw+1)/2 frame made a PERFECT
    # generator score nn_mse 0.0179 on the bundled data (measured; the
    # round-5 frame correction, BASELINE.md) — comparisons BETWEEN models
    # were unaffected (same transform both sides), absolute values were
    # floor-inflated.
    d_raw = raw[..., 0]

    recorded = []  # first-seed samples, reused for --panel (no re-sampling)
    panel_budget = min(256, args.n_samples) if args.panel else 0

    def sample_fn(key, n):
        imgs01, _ = sample_from_checkpoint(
            args.checkpoint, key, num_images=n, sampler=args.sampler,
            ddim_steps=args.ddim_steps, prefer_ema=args.ema, eta=args.eta,
        )
        if sum(c.shape[0] for c in recorded) < panel_budget:
            recorded.append(np.asarray(imgs01))
        return imgs01

    # 64x64 checkpoints are scored against the 2x-upscaled dataset (the
    # stretch-config protocol, BASELINE.md) — upscale BEFORE the clip so
    # the chain matches training exactly (train: normalize_pm1(upscale(raw)))
    probe = sample_fn(_jax.random.PRNGKey(0), 1)
    recorded.clear()  # the 1-image probe is not part of the panel's draw
    if probe.shape[1] != d_raw.shape[1]:
        from igdm_tpu.data.cifar import upscale_2x

        while d_raw.shape[1] < probe.shape[1]:
            d_raw = upscale_2x(d_raw[..., None])[..., 0]
        if d_raw.shape[1] != probe.shape[1]:
            raise SystemExit(
                f"checkpoint samples {probe.shape[1]}x{probe.shape[2]} images; "
                f"pass --data with a matching dataset"
            )
    d01 = np.clip(d_raw, 0.0, 1.0)

    if args.holdout:
        rep = evaluate_generalization(
            sample_fn, d01, n_holdout=args.holdout, split_seed=args.holdout_seed,
            n_samples=args.n_samples, seeds=tuple(args.seeds), batch=args.batch,
        )
    else:
        rep = evaluate_sampler(
            sample_fn, d01, n_samples=args.n_samples, seeds=tuple(args.seeds),
            batch=args.batch,
        )
    if args.panel:
        ref = d01
        if args.holdout:
            ref = d01[holdout_split(d01.shape[0], args.holdout, args.holdout_seed)[0]]
        # reuse the first seed's evaluation samples — a fresh 256-image
        # draw would repeat minutes of device time for statistically
        # identical content (round-5 review)
        samples = np.concatenate(recorded)[: min(256, args.n_samples)]
        rep["panel"] = {
            "path": args.panel,
            "pairs": nn_panel(samples, ref, args.panel),
        }
    print(json.dumps(rep, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
