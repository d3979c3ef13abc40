#!/usr/bin/env python
"""Render image / GT-BEV / predicted-BEV triptychs with per-sample IoU.

Rebuild of reference visualize_predictions.py:11-228: loads a trained
checkpoint, runs jitted batched inference on the val split, and writes
matplotlib figures (one row per sample: camera image, ground-truth BEV mask,
predicted BEV mask annotated with drivable IoU).
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform

import numpy as np

from lmsu_tpu.config import ExperimentConfig, ModelConfig, DataConfig, TrainConfig
from lmsu_tpu.data import create_datasets, make_loader
from lmsu_tpu.models import create_model, init_model
from lmsu_tpu.training import checkpoint as ckptlib


def compute_iou_per_sample(pred: np.ndarray, gt: np.ndarray,
                           cls: int = 1) -> float:
    """Drivable-class IoU for one sample (reference:
    visualize_predictions.py:84-94)."""
    p, g = pred == cls, gt == cls
    union = np.logical_or(p, g).sum()
    if union == 0:
        return float("nan")
    return float(np.logical_and(p, g).sum() / union)


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint",
                   default="checkpoints/fusion_ablation_concat/best.ckpt")
    p.add_argument("--fusion-type", default="concat",
                   choices=["concat", "minimal", "weighted", "gated_sum"])
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--dataset", default="synthetic",
                   choices=["pandaset", "synthetic"])
    p.add_argument("--data-root", default=None)
    p.add_argument("--num-samples", type=int, default=8)
    p.add_argument("--output-dir", default="visualizations")
    p.add_argument("--batch-size", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_ch = {"concat": 256, "minimal": 128, "weighted": 128, "gated_sum": 128}[args.fusion_type]
    mcfg = ModelConfig(num_classes=args.num_classes,
                       fusion_type=args.fusion_type,
                       fusion_out_channels=out_ch)
    dcfg = DataConfig(dataset=args.dataset,
                      root=args.data_root or DataConfig.root,
                      batch_size=args.batch_size)
    model = create_model(mcfg)
    variables = init_model(model, jax.random.PRNGKey(0))

    if os.path.exists(args.checkpoint):
        variables = ckptlib.load_model_variables(args.checkpoint)
        print(f"Loaded {args.checkpoint}")
    else:
        # Checkpoint binaries are not committed (ADVICE r1); the default
        # path only exists after a local training run.
        sys.exit(f"ERROR: checkpoint {args.checkpoint!r} not found. Train "
                 f"one first — e.g.\n  python scripts/train_synthetic.py "
                 f"--epochs 5\nthen pass --checkpoint "
                 f"checkpoints/synthetic_concat/best.ckpt (or point "
                 f"--checkpoint at any run's best.ckpt/latest.ckpt).")

    _, val_ds = create_datasets(dcfg)
    loader = make_loader(val_ds, args.batch_size, shuffle=False)
    predict = jax.jit(lambda i, pts, pv: jnp.argmax(
        model.apply(variables, i, pts, train=False, point_valid=pv),
        axis=-1))

    os.makedirs(args.output_dir, exist_ok=True)
    done = 0
    ious = []
    for batch in loader:
        pv = (jnp.asarray(batch["point_valid"])
              if "point_valid" in batch else None)
        preds = np.asarray(predict(jnp.asarray(batch["image"]),
                                   jnp.asarray(batch["points"]), pv))
        for b in range(len(preds)):
            if not batch["sample_mask"][b] or done >= args.num_samples:
                continue
            img = batch["image"][b]
            gt = batch["segmentation"][b]
            pred = preds[b]
            iou = compute_iou_per_sample(pred, gt)
            ious.append(iou)

            fig, axes = plt.subplots(1, 3, figsize=(12, 4))
            axes[0].imshow(img)
            axes[0].set_title("Camera")
            axes[1].imshow(gt, cmap="viridis", vmin=0, vmax=1)
            axes[1].set_title("GT BEV (drivable)")
            axes[2].imshow(pred, cmap="viridis", vmin=0, vmax=1)
            axes[2].set_title(f"Predicted (IoU {iou:.3f})")
            for ax in axes:
                ax.axis("off")
            path = os.path.join(args.output_dir, f"sample_{done:03d}.png")
            fig.savefig(path, dpi=100, bbox_inches="tight")
            plt.close(fig)
            done += 1
        if done >= args.num_samples:
            break

    valid = [i for i in ious if not np.isnan(i)]
    print(f"Wrote {done} figures to {args.output_dir}/ — "
          f"mean drivable IoU {np.mean(valid):.4f}" if valid else
          f"Wrote {done} figures to {args.output_dir}/")


if __name__ == "__main__":
    main()
