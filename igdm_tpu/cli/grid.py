"""CLI: write the dataset grid PNG (reference generate_grid,
src/ImageGenerationDiffusionModels.jl:25-43)."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="igdm-grid")
    p.add_argument("--data", default=None)
    p.add_argument("--out", default="grid.png")
    args = p.parse_args(argv)

    from igdm_tpu.api import generate_grid

    canvas = generate_grid(args.out, dataset=args.data)
    print(f"saved {canvas.shape[0]}x{canvas.shape[1]} grid to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
