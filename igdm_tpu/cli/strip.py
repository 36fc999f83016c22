"""CLI: strip a training checkpoint down to its sampling-only form.

    python -m igdm_tpu.cli.strip final_model.npz final_model_sampling.npz

Drops optimizer moments / step / RNG (resume-only state, ~2/3 of an AdamW
checkpoint) and keeps params + EMA + BatchNorm stats + metadata — the
committed-artifact size policy (artifacts/README.md).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="igdm-strip", description=__doc__)
    p.add_argument("input", help="training checkpoint (.npz)")
    p.add_argument("output", help="sampling-only checkpoint to write")
    args = p.parse_args(argv)

    from igdm_tpu.checkpoint.pytree_io import strip_for_sampling

    strip_for_sampling(args.input, args.output)
    a = os.path.getsize(args.input) / 1e6
    b = os.path.getsize(args.output) / 1e6
    print(f"{args.input} ({a:.0f} MB) -> {args.output} ({b:.0f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
