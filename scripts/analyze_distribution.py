#!/usr/bin/env python
"""Dataset class-distribution audit + recommended class weights.

Rebuild of reference test_dataset_distribution.py:7-84 and
verify_2class_distribution.py:6-34: per-class pixel histograms over the BEV
labels, inverse-frequency weight recommendation, imbalance warnings, and a
train/val drift check.
"""

import argparse
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform

import numpy as np

from lmsu_tpu.config import DataConfig
from lmsu_tpu.data import create_datasets


def class_histogram(dataset, num_classes: int, max_samples: int = None):
    counts = np.zeros(num_classes, np.int64)
    overflow = 0
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    for i in range(n):
        seg = dataset[i]["segmentation"]
        full = np.bincount(seg[seg >= 0].ravel(), minlength=num_classes)
        counts += full[:num_classes]
        overflow += int(full[num_classes:].sum())
    if overflow:
        # Never truncate silently: an audit over an incomplete histogram
        # would report skewed frequencies and weights.
        print(f"WARNING: {overflow:,} pixels carry labels >= "
              f"{num_classes} and are excluded — rerun with a larger "
              f"--num-classes for a complete audit")
    return counts, n


def report(name: str, counts: np.ndarray):
    total = counts.sum()
    freqs = counts / max(total, 1)
    print(f"\n{name}: {total:,} labeled pixels")
    for c, (n, f) in enumerate(zip(counts, freqs)):
        print(f"  class {c}: {n:>12,} ({100 * f:6.2f}%)")
    # Inverse-frequency weights normalized to mean 1 (the reference's
    # recommendation scheme, test_dataset_distribution.py:29-38).
    inv = 1.0 / np.maximum(freqs, 1e-8)
    weights = inv / inv.mean()
    print(f"  recommended class weights: "
          f"{[round(float(w), 2) for w in weights]}")
    ratio = freqs.max() / max(freqs.min(), 1e-8)
    if ratio > 10:
        print(f"  WARNING: severe class imbalance ({ratio:.0f}:1)")
    return freqs


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="synthetic",
                   choices=["pandaset", "synthetic"])
    p.add_argument("--data-root", default=None)
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--max-samples", type=int, default=200)
    args = p.parse_args(argv)

    dcfg = DataConfig(dataset=args.dataset,
                      root=args.data_root or DataConfig.root)
    train_ds, val_ds = create_datasets(dcfg)
    tr_counts, tr_n = class_histogram(train_ds, args.num_classes,
                                      args.max_samples)
    va_counts, va_n = class_histogram(val_ds, args.num_classes,
                                      args.max_samples)
    tr_f = report(f"train ({tr_n} samples)", tr_counts)
    va_f = report(f"val ({va_n} samples)", va_counts)

    drift = np.abs(tr_f - va_f).max()
    print(f"\ntrain/val max class-frequency drift: {100 * drift:.2f}%")
    if drift > 0.05:
        print("WARNING: train/val distribution drift > 5%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
