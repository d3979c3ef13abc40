#!/usr/bin/env python
"""Standalone checkpoint evaluation: split loss, mIoU, per-class IoU.

The reference has no evaluation entry point — after training, metrics can
only be recovered by re-training or by eyeballing the visualization
script's per-sample IoUs (reference: visualize_predictions.py:84-94).
This script evaluates any trainer checkpoint (plain or KD-student
layout; the EMA shadow is preferred when the run trained with one) over
the val or train split using the same jitted batched eval path as
training (Trainer.validate, incl. the eval-side lax.scan when
--scan-steps > 1), and prints / writes the metrics.

    python scripts/evaluate.py --checkpoint checkpoints/run/best.ckpt
    python scripts/evaluate.py --checkpoint best.ckpt --output-json m.json
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from scripts.common import (add_common_args, apply_env_platform,
                            apply_overrides, build_loaders)

from lmsu_tpu.config import (DataConfig, ExperimentConfig, ModelConfig,
                             TrainConfig)


def evaluate_checkpoint(cfg: ExperimentConfig, checkpoint: str,
                        split: str = "val") -> dict:
    """Load model variables from `checkpoint` and run one eval epoch.

    Returns {"loss", "miou", "class_iou", "split", "checkpoint"}.
    Uses the trainer's own eval machinery so the numbers are bit-identical
    to what training recorded for the same weights and split.
    """
    from lmsu_tpu.training import Trainer
    from lmsu_tpu.training import checkpoint as ckptlib

    train_loader, val_loader = build_loaders(cfg, verbose=False)
    trainer = Trainer(cfg, train_loader, val_loader)
    variables = ckptlib.load_model_variables(checkpoint)
    trainer.state = trainer.state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"])
    loader = val_loader if split == "val" else train_loader
    loss, metrics = trainer._run_epoch(loader, train=False)
    return {"checkpoint": checkpoint, "split": split, "loss": float(loss),
            "miou": float(metrics["miou"]),
            "class_iou": [float(v) for v in metrics["class_iou"]]}


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--checkpoint", required=True,
                   help="trainer checkpoint (plain or KD layout)")
    p.add_argument("--split", default="val", choices=["val", "train"])
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--output-json", default=None,
                   help="also write the metrics dict to this path")
    args = p.parse_args(argv)

    out_ch = {"concat": 256, "minimal": 128, "weighted": 128, "gated_sum": 128}[
        args.fusion_type or "concat"]
    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=args.num_classes,
                          fusion_type=args.fusion_type or "concat",
                          fusion_out_channels=out_ch),
        data=DataConfig(dataset=args.dataset or "synthetic"),
        train=TrainConfig(class_weights=(0.4, 3.5)))
    cfg = apply_overrides(cfg, args)

    result = evaluate_checkpoint(cfg, args.checkpoint, args.split)
    print(f"{args.split} loss {result['loss']:.4f}  "
          f"mIoU {result['miou']:.4f}  "
          f"class IoU {['%.4f' % v for v in result['class_iou']]}")
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(result, f, indent=2)
        print(f"Wrote {args.output_json}")
    return result


if __name__ == "__main__":
    main()
