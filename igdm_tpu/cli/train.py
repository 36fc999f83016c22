"""CLI: train a model.

Replaces the reference's executable scripts (src/train_brain.jl, run-on-include
at :307; last_desperate_attempt/src/train_net.jl:240) with a proper argparse
entry point:

    python -m igdm_tpu.cli.train --model ddpm --epochs 100 --timesteps 500
    python -m igdm_tpu.cli.train --model unet4 --epochs 100   # modern recipe
    python -m igdm_tpu.cli.train --model mlp --epochs 100     # one-shot MLP
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="igdm-train", description=__doc__)
    p.add_argument(
        "--model",
        choices=["ddpm", "unet4", "mlp", "flow", "reflow", "consistency",
                 "conditional", "superres", "latent"],
        default="ddpm",
    )
    p.add_argument("--data", default=None, help=".mat dataset path (default: bundled)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--timesteps", type=int, default=None, help="diffusion T")
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--min-delta", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default=".")
    p.add_argument("--checkpoint-every", type=int, default=None)
    p.add_argument("--loss-curve", default="training_loss.png")
    p.add_argument("--metrics", default=None, help="JSONL metrics path")
    p.add_argument("--n-devices", type=int, default=None, help="data-parallel mesh size")
    p.add_argument("--base-ch", type=int, default=None, help="unet4 base width (default 80)")
    p.add_argument("--resume", default=None, help="checkpoint to resume DDPM training from")
    p.add_argument(
        "--teacher", default=None,
        help="--model reflow: trained flow checkpoint to distill (2-rectified "
        "flow); --model consistency: trained DDPM checkpoint to distill",
    )
    p.add_argument(
        "--cd-steps", type=int, default=4000,
        help="--model consistency: total distillation optimization steps",
    )
    p.add_argument(
        "--cd-grid", type=int, default=18,
        help="--model consistency: sub-grid intervals N for the self-consistency pairs",
    )
    p.add_argument(
        "--coupling-pairs", type=int, default=4096,
        help="--model reflow: number of teacher ODE couplings to generate",
    )
    p.add_argument(
        "--coupling-steps", type=int, default=64,
        help="--model reflow: teacher ODE steps per coupling (heun)",
    )
    p.add_argument(
        "--classes", type=int, default=8,
        help="--model conditional: number of k-means pseudo-classes "
        "(data/labels.kmeans_labels; the dataset ships no labels)",
    )
    p.add_argument(
        "--drop-prob", type=float, default=0.1,
        help="--model conditional: classifier-free label-dropout probability",
    )
    p.add_argument(
        "--factor", type=int, default=4,
        help="--model superres: upscaling factor (low-res pairs derived by "
        "average pooling)",
    )
    p.add_argument(
        "--ae", default=None,
        help="--model latent: pre-trained autoencoder checkpoint (default: "
        "train one first and save ae_model.npz in --out-dir). --model flow: "
        "train LATENT flow matching on this autoencoder's latents (the "
        "recommended serving stack's teacher — reflow it with --model "
        "reflow --teacher for 1-call latent serving); if the path does not "
        "exist, the autoencoder is trained first and saved there",
    )
    p.add_argument(
        "--ae-epochs", type=int, default=200,
        help="--model latent: autoencoder training epochs (when no --ae)",
    )
    p.add_argument(
        "--latent-ch", type=int, default=4,
        help="--model latent: latent channels of a newly trained autoencoder",
    )
    p.add_argument(
        "--conditional", action="store_true",
        help="--model latent: train a CLASS-CONDITIONAL latent DDPM on "
        "--classes k-means pseudo-labels (guided CFG sampling + decode; "
        "the Stable-Diffusion-shaped stack)",
    )
    p.add_argument(
        "--kl-weight", type=float, default=1e-2,
        help="--model latent: VAE KL weight — the coverage lever (the "
        "BASELINE.md latent sweep measured 1e-4 -> near-memorization, "
        "1e-2 -> balanced, on the 500-image set)",
    )
    p.add_argument(
        "--holdout", type=int, default=0,
        help="hold out N images from training (deterministic split, "
        "utils/quality.holdout_split) — the generalization protocol: score "
        "the result with igdm-quality --holdout N to compare fidelity "
        "against seen vs unseen data",
    )
    p.add_argument("--holdout-seed", type=int, default=0,
                   help="split seed for --holdout (must match at scoring)")
    p.add_argument("--cifar", default=None, help="CIFAR-10 batches dir (stretch config)")
    p.add_argument("--grayscale", action="store_true", help="convert CIFAR to 1 channel")
    p.add_argument(
        "--image-size", type=int, default=32, choices=[32, 64],
        help="64 upscales the 32x32 source 2x (stretch config)",
    )
    p.add_argument("--mid-attn", action="store_true", help="bottleneck self-attention (stretch)")
    p.add_argument(
        "--attn-levels", type=int, nargs="*", default=None, metavar="L",
        help="unet4 down-path levels (1-based) that get self-attention, "
        "mirrored in the decoder; --attn-levels 2 at --image-size 64 puts "
        "attention on the 32x32 maps (N=1024: the FlashAttention path)",
    )
    p.add_argument(
        "--schedule", choices=["linear", "cosine"], default="linear",
        help="beta schedule for --model ddpm (cosine = Improved-DDPM quality recipe)",
    )
    p.add_argument(
        "--backbone", choices=["unet_small", "unet4"], default="unet_small",
        help="noise predictor for --model ddpm (unet4+cosine+ema is the quality recipe)",
    )
    p.add_argument("--ema-decay", type=float, default=0.0, help="EMA of weights (0 disables; 0.999 typical)")
    p.add_argument(
        "--epochs-per-dispatch", type=int, default=1,
        help="epochs scanned per jitted call (bit-identical numbers; 8-10 "
        "gives ~8x wall speedup on small datasets by amortizing dispatch)",
    )
    p.add_argument(
        "--compute-dtype", choices=["float32", "bfloat16"], default="float32",
        help="conv compute dtype (bfloat16 = mixed precision)",
    )
    p.add_argument(
        "--objective", choices=["eps", "v"], default="eps",
        help="training target: eps (reference parity) or v-prediction",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    from igdm_tpu.data.images import save_loss_curve
    from igdm_tpu.data.mat import load_synthetic_images, normalize_pm1
    from igdm_tpu.utils.metrics import MetricsLogger

    if args.cifar:
        from igdm_tpu.data.cifar import load_cifar10

        imgs, _ = load_cifar10(args.cifar, grayscale=args.grayscale)
    else:
        imgs = load_synthetic_images(args.data)
    if args.image_size == 64:
        from igdm_tpu.data.cifar import upscale_2x

        imgs = upscale_2x(imgs)
    if args.holdout:
        from igdm_tpu.utils.quality import holdout_split

        tr_idx, _ = holdout_split(len(imgs), args.holdout, args.holdout_seed)
        imgs = imgs[tr_idx]
        print(f"holdout split: training on {len(imgs)} images "
              f"({args.holdout} held out, seed {args.holdout_seed})")
    metrics = MetricsLogger(args.metrics, echo=False)

    if args.model == "mlp":
        from igdm_tpu.training.mlp_trainer import train_mlp

        params, losses = train_mlp(
            imgs,
            lr=args.lr or 1e-3,
            epochs=args.epochs,
            patience=args.patience,
            min_delta=args.min_delta,
            seed=args.seed,
            log=print,
        )
        for i, l in enumerate(losses):
            metrics.log(i + 1, loss=l)
        import numpy as np

        np.savez(
            os.path.join(args.out_dir, "mlp_model.npz"),
            **{f"params/{k}/{kk}": v for k, d in params.items() for kk, v in d.items()},
        )
    elif args.model == "flow":
        from igdm_tpu.config import TrainConfig
        from igdm_tpu.training.flow import train_flow

        train_cfg = TrainConfig(
            batch_size=args.batch_size or 64,
            epochs=args.epochs,
            lr=args.lr or 2e-4,
            patience=args.patience if args.patience is not None else 10,
            min_delta=args.min_delta,
            seed=args.seed,
            ema_decay=args.ema_decay,
            epochs_per_dispatch=args.epochs_per_dispatch,
            compute_dtype=args.compute_dtype,
        )
        if args.ae:
            # latent flow matching: the recommended serving stack's teacher
            # (train_reflow keeps the latent metadata, so --model reflow
            # --teacher latent_flow_model.npz completes the stack CLI-only)
            from igdm_tpu.training.latent import train_autoencoder, train_latent_flow

            imgs_pm1 = normalize_pm1(imgs)
            if not os.path.isfile(args.ae):
                train_autoencoder(
                    imgs_pm1, epochs=args.ae_epochs,
                    batch_size=args.batch_size or 64, latent_ch=args.latent_ch,
                    kl_weight=args.kl_weight, seed=args.seed,
                    out_path=args.ae, log=print,
                )
            res, _ = train_latent_flow(
                imgs_pm1, args.ae, train_cfg, base_ch=args.base_ch or 64,
                mid_attn=args.mid_attn, out_dir=args.out_dir, log=print,
            )
        else:
            res = train_flow(
                normalize_pm1(imgs), train_cfg, base_ch=args.base_ch or 32,
                mid_attn=args.mid_attn, out_dir=args.out_dir, log=print,
            )
        for i, l in enumerate(res.losses):
            metrics.log(i + 1, loss=l)
        losses = res.losses
    elif args.model == "reflow":
        from igdm_tpu.config import TrainConfig
        from igdm_tpu.training.flow import train_reflow

        if not args.teacher:
            print("--model reflow requires --teacher <flow checkpoint>")
            return 2
        train_cfg = TrainConfig(
            batch_size=args.batch_size or 128,
            epochs=args.epochs,
            lr=args.lr or 1e-4,
            patience=args.patience if args.patience is not None else 10,
            min_delta=args.min_delta,
            seed=args.seed,
            ema_decay=args.ema_decay,
            epochs_per_dispatch=args.epochs_per_dispatch,
            compute_dtype=args.compute_dtype,
        )
        res = train_reflow(
            args.teacher, train_cfg, num_pairs=args.coupling_pairs,
            coupling_steps=args.coupling_steps, out_dir=args.out_dir,
            seed=args.seed, log=print,
        )
        for i, l in enumerate(res.losses):
            metrics.log(i + 1, loss=l)
        losses = res.losses
    elif args.model == "consistency":
        from igdm_tpu.training.consistency import consistency_distill_checkpoint

        if not args.teacher:
            print("--model consistency requires --teacher <DDPM checkpoint>")
            return 2
        out_path = os.path.join(args.out_dir, "consistency_model.npz")
        _, _, _, losses = consistency_distill_checkpoint(
            args.teacher, normalize_pm1(imgs), n_grid=args.cd_grid,
            steps=args.cd_steps, batch_size=args.batch_size or 64,
            lr=args.lr or 1e-4, compute_dtype=args.compute_dtype,
            seed=args.seed, out_path=out_path, log=print,
        )
        for i, l in enumerate(losses):
            metrics.log(i + 1, loss=l)
        print(f"saved {out_path}")
    elif args.model == "latent":
        from igdm_tpu.config import DiffusionConfig, TrainConfig
        from igdm_tpu.training.latent import train_autoencoder, train_latent_ddpm

        imgs_pm1 = normalize_pm1(imgs)
        ae_path = args.ae
        if not ae_path:
            ae_path = os.path.join(args.out_dir, "ae_model.npz")
            train_autoencoder(
                imgs_pm1, epochs=args.ae_epochs,
                batch_size=args.batch_size or 64, latent_ch=args.latent_ch,
                kl_weight=args.kl_weight,
                seed=args.seed, out_path=ae_path, log=print,
            )
        diff_cfg = DiffusionConfig(
            num_steps=args.timesteps or 500, schedule=args.schedule
        )
        train_cfg = TrainConfig(
            batch_size=args.batch_size or 64,
            epochs=args.epochs,
            lr=args.lr or 2e-4,
            patience=args.patience if args.patience is not None else 10,
            min_delta=args.min_delta,
            seed=args.seed,
            ema_decay=args.ema_decay,
            epochs_per_dispatch=args.epochs_per_dispatch,
            compute_dtype=args.compute_dtype,
            checkpoint_every=0,
        )
        mesh = None
        if args.n_devices:
            from igdm_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(args.n_devices)
        if args.conditional:
            from igdm_tpu.data.labels import kmeans_labels
            from igdm_tpu.training.latent import train_latent_conditional

            labels = kmeans_labels((imgs + 1.0) / 2.0, k=args.classes,
                                   seed=args.seed)
            res, _ = train_latent_conditional(
                imgs_pm1, labels, args.classes, ae_path, diff_cfg, train_cfg,
                drop_prob=args.drop_prob, base_ch=args.base_ch or 64,
                mesh=mesh, out_dir=args.out_dir, log=print,
            )
        else:
            res, _ = train_latent_ddpm(
                imgs_pm1, ae_path, diff_cfg, train_cfg,
                base_ch=args.base_ch or 64, mesh=mesh, out_dir=args.out_dir,
                log=print,
            )
        for i, l in enumerate(res.losses):
            metrics.log(i + 1, loss=l)
        losses = res.losses
    elif args.model == "conditional":
        from igdm_tpu.config import DiffusionConfig, TrainConfig
        from igdm_tpu.data.labels import kmeans_labels
        from igdm_tpu.training.conditional import train_conditional_ddpm

        K = args.classes
        # cluster in display space like the recorded recipe
        # (artifacts/samples_conditional_cfg2.png provenance)
        labels = kmeans_labels((imgs + 1.0) / 2.0, k=K, seed=args.seed)
        diff_cfg = DiffusionConfig(
            num_steps=args.timesteps or 500, schedule=args.schedule
        )
        train_cfg = TrainConfig(
            batch_size=args.batch_size or 64,
            epochs=args.epochs,
            lr=args.lr or 2e-4,
            patience=args.patience if args.patience is not None else 10,
            min_delta=args.min_delta,
            seed=args.seed,
            ema_decay=args.ema_decay,
            epochs_per_dispatch=args.epochs_per_dispatch,
            compute_dtype=args.compute_dtype,
        )
        res = train_conditional_ddpm(
            normalize_pm1(imgs), labels, K, diff_cfg, train_cfg,
            drop_prob=args.drop_prob, base_ch=args.base_ch or 32,
            mid_attn=args.mid_attn, out_dir=args.out_dir, log=print,
        )
        for i, l in enumerate(res.losses):
            metrics.log(i + 1, loss=l)
        losses = res.losses
    elif args.model == "superres":
        import numpy as np

        from igdm_tpu.config import DiffusionConfig, TrainConfig
        from igdm_tpu.training.superres import train_superres

        # min-max scale to a true [-1,1]: normalize_pm1's x2-1 spans
        # [-3.14, 1.28] on the bundled data and fights the samplers' clip
        lo_v, hi_v = float(imgs.min()), float(imgs.max())
        hr = (2.0 * (imgs - lo_v) / (hi_v - lo_v) - 1.0).astype(np.float32)
        diff_cfg = DiffusionConfig(
            num_steps=args.timesteps or 500, schedule=args.schedule
        )
        train_cfg = TrainConfig(
            batch_size=args.batch_size or 64,
            epochs=args.epochs,
            lr=args.lr or 2e-4,
            patience=args.patience if args.patience is not None else 10,
            min_delta=args.min_delta,
            seed=args.seed,
            ema_decay=args.ema_decay,
            epochs_per_dispatch=args.epochs_per_dispatch,
            compute_dtype=args.compute_dtype,
        )
        res = train_superres(
            hr, args.factor, diff_cfg, train_cfg, base_ch=args.base_ch or 32,
            out_dir=args.out_dir, log=print,
        )
        for i, l in enumerate(res.losses):
            metrics.log(i + 1, loss=l)
        losses = res.losses
    elif args.model == "unet4":
        from igdm_tpu.training.modern import ModernTrainConfig, train_modern

        cfg = ModernTrainConfig(
            epochs=args.epochs,
            batch_size=args.batch_size or 32,
            lr_start=args.lr or 3e-3,
            num_steps=args.timesteps or 150,
            patience=args.patience if args.patience is not None else 9,
            checkpoint_every=args.checkpoint_every or 10,
            seed=args.seed,
            base_ch=args.base_ch or 80,
        )
        res = train_modern(imgs, cfg, out_dir=args.out_dir, log=print)
        for i, (l, lr) in enumerate(zip(res.losses, res.lrs)):
            metrics.log(i + 1, loss=l, lr=lr)
        losses = res.losses
    else:
        from igdm_tpu.config import DiffusionConfig, TrainConfig
        from igdm_tpu.training.ddpm import train_ddpm

        mesh = None
        if args.n_devices:
            from igdm_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(args.n_devices)
        diff_cfg = DiffusionConfig(num_steps=args.timesteps or 500, schedule=args.schedule)
        train_cfg = TrainConfig(
            batch_size=args.batch_size or 64,
            epochs=args.epochs,
            lr=args.lr or 2e-4,
            patience=args.patience if args.patience is not None else 10,
            min_delta=args.min_delta,
            checkpoint_every=args.checkpoint_every or 5,
            seed=args.seed,
            ema_decay=args.ema_decay,
            epochs_per_dispatch=args.epochs_per_dispatch,
            compute_dtype=args.compute_dtype,
            objective=args.objective,
        )
        res = train_ddpm(
            normalize_pm1(imgs), diff_cfg, train_cfg, mesh=mesh, out_dir=args.out_dir,
            resume_from=args.resume, mid_attn=args.mid_attn,
            attn_levels=tuple(args.attn_levels or ()),
            model_kind=args.backbone, base_ch=args.base_ch or 64, log=print,
        )
        for i, l in enumerate(res.losses):
            metrics.log(i + 1, loss=l)
        losses = res.losses

    save_loss_curve(losses, os.path.join(args.out_dir, args.loss_curve))
    print(json.dumps({"epochs": len(losses), "final_loss": losses[-1] if losses else None}))
    metrics.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
