"""CLI: generate images from a trained checkpoint.

Mirrors the reference samplers:
  * `julia src/generate_images.jl` (loads trained_model.bson, 5 images) ->
    python -m igdm_tpu.cli.sample trained_model.npz -n 5
  * `julia sample.jl <model.bson> [n]` (last_desperate_attempt/src/sample.jl:3-30)
    -> the positional model-path + optional count arguments below.

Accepts this framework's .npz checkpoints AND the reference's .bson ones
(auto-detected by extension; BSON goes through checkpoint.bson_import).
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="igdm-sample", description=__doc__)
    p.add_argument("model", help="checkpoint path (.npz or reference .bson)")
    p.add_argument("n", nargs="?", type=int, default=16, help="number of samples (default 16)")
    p.add_argument("--timesteps", type=int, default=None, help="diffusion T override")
    p.add_argument("--sampler", choices=["ancestral", "ddim"], default="ancestral")
    p.add_argument("--ddim-steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="samples.png")
    p.add_argument("--per-image", action="store_true", help="also save generated_image_i.png per image")
    p.add_argument("--debug-nans", action="store_true", help="raise at the first NaN produced on device")
    p.add_argument("--ema", action="store_true", help="sample with the EMA weights if present")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.debug_nans:
        from igdm_tpu.utils.debug import enable_nan_debugging

        enable_nan_debugging()
    import jax.numpy as jnp
    import numpy as np

    from igdm_tpu.config import DiffusionConfig, TrainConfig
    from igdm_tpu.data.images import save_image_heatmap, save_sample_grid

    key = jax.random.PRNGKey(args.seed)
    T = args.timesteps

    if args.model.endswith(".bson"):
        from igdm_tpu.checkpoint.bson_import import import_simple_unet

        params, state, meta = import_simple_unet(args.model)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = jax.tree_util.tree_map(jnp.asarray, state)
        # the committed reference scripts run T=5 (src/generate_images.jl:12)
        T = T or 5
    else:
        from igdm_tpu.checkpoint.pytree_io import load_for_sampling

        params, state, meta = load_for_sampling(args.model, prefer_ema=args.ema)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = jax.tree_util.tree_map(jnp.asarray, state)

        if meta.get("model") == "unet4":
            # modern recipe: sample with the TRAINING sigma schedule
            from igdm_tpu.sampling.ancestral import sample_with_sigmas
            from igdm_tpu.training.modern import ModernTrainConfig, sigma_schedule
            from igdm_tpu.config import config_from_dict

            cfg4 = config_from_dict(ModernTrainConfig, meta.get("modern_cfg", {}))
            norm = meta.get("norm", {})
            out = sample_with_sigmas(
                params,
                key,
                sigma_schedule(cfg4),
                num_images=args.n,
                mu=norm.get("mu", 0.0),
                sigma=norm.get("sigma", 1.0),
                final_sigmoid=cfg4.final_sigmoid,
            )
            imgs01 = np.clip(np.asarray(out)[..., 0], 0.0, 1.0)
            save_sample_grid(imgs01, args.out, title="Generated Images")
            print(f"saved {args.n} samples (unet4, T={cfg4.num_steps}) to {args.out}")
            return 0
        if T is None and "diff_cfg" in meta:
            from igdm_tpu.config import config_from_dict

            T = config_from_dict(DiffusionConfig, meta["diff_cfg"]).num_steps
        T = T or 500

    data_meta = meta.get("data", {}) if isinstance(meta, dict) else {}
    channels = int(data_meta.get("channels", 1))
    image_size = tuple(data_meta.get("image_size", (32, 32)))

    cfg = DiffusionConfig(num_steps=T)
    if args.sampler == "ddim":
        from igdm_tpu.sampling.ancestral import sample_ddim

        out = sample_ddim(
            params, state, key, num_images=args.n, cfg=cfg,
            num_sample_steps=args.ddim_steps, channels=channels, image_size=image_size,
        )
    else:
        from igdm_tpu.sampling.ancestral import sample_ddpm

        out = sample_ddpm(
            params, state, key, num_images=args.n, cfg=cfg,
            channels=channels, image_size=image_size,
        )

    arr = np.asarray(out)
    imgs01 = (arr[..., 0] + 1.0) / 2.0 if channels == 1 else (arr + 1.0) / 2.0
    save_sample_grid(imgs01, args.out, title="Generated Images")
    print(f"saved {args.n} samples (T={T}, {args.sampler}) to {args.out}")
    if args.per_image:
        for i in range(args.n):
            save_image_heatmap(
                imgs01[i], f"generated_image_{i + 1}.png", title=f"Generated Image {i + 1}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
