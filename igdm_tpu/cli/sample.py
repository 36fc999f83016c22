"""CLI: generate images from a trained checkpoint.

Mirrors the reference samplers:
  * `julia src/generate_images.jl` (loads trained_model.bson, 5 images) ->
    python -m igdm_tpu.cli.sample trained_model.npz -n 5
  * `julia sample.jl <model.bson> [n]` (last_desperate_attempt/src/sample.jl:3-30)
    -> the positional model-path + optional count arguments below.

Accepts this framework's .npz checkpoints AND the reference's .bson ones;
model family / schedule / image shape are read from checkpoint metadata
(sampling.auto.sample_from_checkpoint).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="igdm-sample", description=__doc__)
    p.add_argument("model", help="checkpoint path (.npz or reference .bson)")
    p.add_argument("n", nargs="?", type=int, default=16, help="number of samples (default 16)")
    p.add_argument("--timesteps", type=int, default=None, help="diffusion T override")
    p.add_argument(
        "--sampler", choices=["auto", "ancestral", "ddim", "dpmpp", "heun", "textbook"],
        default="auto",
        help="auto reads the checkpoint: reference-exact ancestral for "
        "unet_small, textbook posterior for unet4",
    )
    p.add_argument("--ddim-steps", type=int, default=50, help="steps for --sampler ddim/dpmpp")
    p.add_argument(
        "--eta", type=float, default=0.0,
        help="stochastic-DDIM noise scale for --sampler ddim (0 = "
        "deterministic, 1 = posterior-matched noise — the few-step "
        "coverage lever for latent checkpoints, BASELINE.md)",
    )
    p.add_argument(
        "--steps", type=int, default=None,
        help="model calls for consistency checkpoints (1 = pure consistency; "
        "2/4 = multistep refinement)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="samples.png")
    p.add_argument("--per-image", action="store_true", help="also save generated_image_i.png per image")
    p.add_argument("--debug-nans", action="store_true", help="raise at the first NaN produced on device")
    p.add_argument("--ema", action="store_true", help="sample with the EMA weights if present")
    p.add_argument(
        "--label", type=int, default=None,
        help="class id for conditional checkpoints (default: cycle all classes)",
    )
    p.add_argument(
        "--guidance", type=float, default=2.0,
        help="classifier-free guidance scale for conditional checkpoints",
    )
    p.add_argument(
        "--inpaint", default=None, metavar="MASK",
        help="inpaint mode: PNG mask (white = keep, black = regenerate); "
        "requires --image; draws n independent completions",
    )
    p.add_argument(
        "--image", default=None,
        help="input PNG in [0,1] whose masked-out region is synthesized (with --inpaint)",
    )
    p.add_argument(
        "--resample", type=int, default=1,
        help="RePaint time-travel count for --inpaint (r>1 harmonizes boundaries)",
    )
    return p


def _read_gray01(path: str):
    """Read a PNG as (H, W) float32 in [0, 1] (dtype-aware, like igdm-upscale)."""
    import matplotlib.image as mpimg
    import numpy as np

    img = np.asarray(mpimg.imread(path))
    if img.dtype.kind in "ui":
        img = img.astype(np.float32) / np.iinfo(img.dtype).max
    img = img.astype(np.float32)
    if img.ndim == 3:
        img = img[..., :3].mean(axis=-1)
    return np.clip(img, 0.0, 1.0)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.debug_nans:
        from igdm_tpu.utils.debug import enable_nan_debugging

        enable_nan_debugging()

    from igdm_tpu.data.images import save_image_heatmap, save_sample_grid

    if args.inpaint:
        if not args.image:
            raise SystemExit("--inpaint requires --image (the picture to complete)")
        from igdm_tpu.sampling.auto import inpaint_from_checkpoint

        known01 = _read_gray01(args.image)
        mask = _read_gray01(args.inpaint)
        if mask.shape != known01.shape:
            raise SystemExit(
                f"mask {mask.shape} and image {known01.shape} sizes differ"
            )
        imgs01, info = inpaint_from_checkpoint(
            args.model, jax.random.PRNGKey(args.seed), known01, mask,
            num_images=args.n, resample=args.resample, prefer_ema=args.ema,
        )
        save_sample_grid(imgs01, args.out, title="Inpainted")
        print(
            f"saved {args.n} inpainted completion(s) ({info['model']}, T={info['T']}, "
            f"resample={info['resample']}) to {args.out}"
        )
        return 0

    from igdm_tpu.sampling.auto import sample_from_checkpoint

    imgs01, info = sample_from_checkpoint(
        args.model,
        jax.random.PRNGKey(args.seed),
        num_images=args.n,
        sampler=args.sampler,
        ddim_steps=args.ddim_steps,
        timesteps=args.timesteps,
        prefer_ema=args.ema,
        label=args.label,
        guidance_scale=args.guidance,
        steps=args.steps,
        eta=args.eta,
    )
    save_sample_grid(imgs01, args.out, title="Generated Images")
    print(
        f"saved {args.n} samples ({info['model']}, T={info['T']}, {info['sampler']}) to {args.out}"
    )
    if args.per_image:
        for i in range(args.n):
            save_image_heatmap(
                imgs01[i], f"generated_image_{i + 1}.png", title=f"Generated Image {i + 1}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
