#!/usr/bin/env python
"""Publication figure of training curves across ablation runs.

Rebuild of reference plot_training_curves.py:16-214: reads each run's
training_history.json (reference schema), draws a 2x2 grid (train/val loss,
train/val mIoU) with peak-mIoU stars, prints summary statistics.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs", nargs="+",
                   default=["checkpoints/fusion_ablation_concat",
                            "checkpoints/fusion_ablation_minimal",
                            "checkpoints/fusion_ablation_weighted"],
                   help="run dirs containing training_history.json")
    p.add_argument("--labels", nargs="+", default=None)
    p.add_argument("--output", default="training_curves.png")
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    histories = {}
    labels = args.labels or [os.path.basename(r.rstrip("/")) for r in args.runs]
    if len(labels) != len(args.runs):
        p.error(f"--labels has {len(labels)} entries for {len(args.runs)} "
                f"runs (zip would silently drop runs)")
    for run, label in zip(args.runs, labels):
        path = os.path.join(run, "training_history.json")
        if not os.path.exists(path):
            print(f"skip {label}: no {path}")
            continue
        with open(path) as f:
            histories[label] = json.load(f)
    if not histories:
        print("No histories found.")
        return 1

    fig, axes = plt.subplots(2, 2, figsize=(13, 9))
    panels = [("train_loss", "Train loss"), ("val_loss", "Val loss"),
              ("train_miou", "Train mIoU"), ("val_miou", "Val mIoU")]
    for ax, (key, title) in zip(axes.ravel(), panels):
        for label, h in histories.items():
            epochs = range(1, len(h[key]) + 1)
            line, = ax.plot(epochs, h[key], marker="o", markersize=3,
                            label=label)
            if key == "val_miou" and h[key]:
                best_e = max(epochs, key=lambda e: h[key][e - 1])
                ax.plot(best_e, h[key][best_e - 1], marker="*", markersize=14,
                        color=line.get_color())
        ax.set_title(title)
        ax.set_xlabel("Epoch")
        ax.grid(alpha=0.3)
        ax.legend()
    fig.suptitle("Training curves")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"Wrote {args.output}")

    print(f"\n{'run':>28s} {'best val mIoU':>14s} {'@epoch':>7s} "
          f"{'final lr':>10s}")
    for label, h in histories.items():
        if h["val_miou"]:
            best = max(h["val_miou"])
            ep = h["val_miou"].index(best) + 1
            print(f"{label:>28s} {best:14.4f} {ep:7d} {h['lr'][-1]:10.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
