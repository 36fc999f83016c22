"""CLI: super-resolve images with a trained SR3 upscaler checkpoint
(training/superres.py). A capability the reference lacks — its pipelines
generate at the dataset's fixed 32x32 only (src/generate_images.jl:231-245).

    igdm-upscale superres_model.npz input.png --out upscaled.png
    igdm-upscale superres_model.npz --dataset SyntheticImages500.mat -n 8

Inputs are grayscale images in [0, 1]; the tool maps to the model's [-1, 1]
convention and back.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="igdm-upscale", description=__doc__)
    p.add_argument("model", help="superres checkpoint (.npz with meta['superres'])")
    p.add_argument("image", nargs="?", default=None,
                   help="input PNG (grayscale); omit with --dataset")
    p.add_argument("--dataset", default=None,
                   help=".mat dataset to draw low-res inputs from (demo mode)")
    p.add_argument("-n", type=int, default=4, help="images to draw with --dataset")
    p.add_argument("--steps", type=int, default=50, help="DDIM steps")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="upscaled.png")
    p.add_argument("--ema", action="store_true", help="use EMA weights if present")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from igdm_tpu.checkpoint.pytree_io import load_for_sampling
    from igdm_tpu.config import DiffusionConfig, config_from_dict
    from igdm_tpu.data.images import save_sample_grid
    from igdm_tpu.sampling.superres import sample_superres

    params, _, meta = load_for_sampling(args.model, prefer_ema=args.ema)
    if "superres" not in meta:
        raise SystemExit(f"{args.model} is not a super-resolution checkpoint "
                         "(no meta['superres']; train with training/superres.py)")
    factor = int(meta["superres"]["factor"])
    cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)

    if args.dataset:
        from igdm_tpu.data.mat import load_synthetic_images
        from igdm_tpu.training.superres import make_lowres

        raw = load_synthetic_images(args.dataset)
        lo_v, hi_v = raw.min(), raw.max()
        hr01 = (raw - lo_v) / (hi_v - lo_v)  # [0,1]
        # model trained at image_size; derive matching low-res inputs
        h, w = meta.get("data", {}).get("image_size", [64, 64])
        if hr01.shape[1] * 2 == h:  # 2x-upscaled training set convention
            from igdm_tpu.data.cifar import upscale_2x

            hr01 = upscale_2x(hr01)
        lowres01 = np.asarray(make_lowres(jnp.asarray(hr01[: args.n]), factor))
    elif args.image:
        import matplotlib.image as mpimg

        img = np.asarray(mpimg.imread(args.image))
        if img.dtype.kind in "ui":  # JPEG/16-bit PNG decode to integers
            img = img.astype(np.float32) / np.iinfo(img.dtype).max
        img = img.astype(np.float32)
        if img.ndim == 3:
            img = img[..., :3].mean(axis=-1)  # grayscale
        if img.min() < 0.0 or img.max() > 1.0:
            raise SystemExit(
                f"{args.image}: pixel values span [{img.min():.3g}, {img.max():.3g}] "
                "— expected a [0, 1] image"
            )
        lowres01 = img[None, :, :, None]
    else:
        raise SystemExit("provide an input PNG or --dataset (see --help)")

    out = sample_superres(
        params, jnp.asarray(lowres01 * 2.0 - 1.0), jax.random.PRNGKey(args.seed),
        factor=factor, cfg=cfg, num_sample_steps=args.steps,
    )
    up01 = (np.asarray(out)[..., 0] + 1.0) / 2.0
    save_sample_grid(up01, args.out, title=f"SR3 x{factor} ({args.steps} steps)")
    print(f"upscaled {len(up01)} image(s) x{factor} -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
