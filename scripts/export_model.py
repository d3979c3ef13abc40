#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained serving artifact.

Wraps Predictor.export() (lmsu_tpu/inference.py): the weights are baked
into a versioned StableHLO module via jax.export, so serving needs only
jax + the artifact — no model code, flax, or checkpoint. See
docs/QUICKSTART.md §4.

Usage:
  python scripts/export_model.py --checkpoint checkpoints/run/best.ckpt \
      --output student.stablehlo [--batch-size 1] [--fusion-type weighted]
      [--fusion-channels 128] [--bf16] [--platforms cpu tpu]
"""

import argparse
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform


def main(argv=None) -> None:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--fusion-type", default="weighted",
                   choices=["concat", "minimal", "weighted", "gated_sum"])
    p.add_argument("--fusion-channels", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-points", type=int, default=5000)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 activations (match TPU training)")
    p.add_argument("--no-point-valid", action="store_true",
                   help="omit the point_valid mask input (only safe when "
                   "serving unpadded clouds)")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms (e.g. cpu tpu) for a "
                   "cross-platform artifact; default = current backend")
    args = p.parse_args(argv)

    import os

    from lmsu_tpu.config import ModelConfig
    from lmsu_tpu.inference import Predictor

    if not os.path.exists(args.checkpoint):
        sys.exit(f"ERROR: checkpoint {args.checkpoint!r} not found. Train "
                 f"one first — e.g.\n  python scripts/train_synthetic.py")
    cfg = ModelConfig(num_classes=args.num_classes,
                      fusion_type=args.fusion_type,
                      fusion_out_channels=args.fusion_channels)
    pred = Predictor.from_checkpoint(args.checkpoint, cfg, bf16=args.bf16)
    pred.export(args.output, batch_size=args.batch_size,
                num_points=args.num_points,
                with_point_valid=not args.no_point_valid,
                platforms=tuple(args.platforms) if args.platforms else None)
    size = os.path.getsize(args.output) / 1e6
    print(f"Wrote {args.output} ({size:.1f} MB, batch={args.batch_size}, "
          f"{args.fusion_type}/{args.fusion_channels}"
          f"{', bf16' if args.bf16 else ''})")


if __name__ == "__main__":
    main()
