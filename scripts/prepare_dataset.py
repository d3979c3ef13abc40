#!/usr/bin/env python
"""Pre-decode a dataset into memory-mapped packs (offline, run once).

Writes <out>/train and <out>/val packs (data/packed.py) from a PandaSet
tree or the synthetic fixture; training then uses `--dataset packed --root
<out>` and pays ~zero host decode per epoch — the closure for the
PandaSet-scale feeding gap (BASELINE.md "Input pipeline": raw decode is
~38 ms/frame on one core vs a ~0.9 ms/frame device step).

Decode parallelism: --workers threads (the hot paths — PIL JPEG, numpy,
the native C++ ops — release the GIL).

Usage:
  python scripts/prepare_dataset.py --dataset pandaset --root data/pandaset \
      --out packs/pandaset [--image-size 256 256] [--grid-size 64 64] \
      [--max-points 5000] [--workers 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lmsu_tpu.config import DataConfig
from lmsu_tpu.data import create_datasets, write_pack


class _PrefetchedView:
    """Read-ahead view so write_pack's sequential reads overlap decode."""

    def __init__(self, dataset, workers: int):
        self.dataset = dataset
        self.workers = workers
        self._pool = None
        self._futures = {}

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        if self.workers <= 1:
            return self.dataset[i]
        from concurrent.futures import ThreadPoolExecutor
        if self._pool is None:
            self._pool = ThreadPoolExecutor(self.workers)
        # schedule a window ahead of the cursor
        for j in range(i, min(i + 2 * self.workers, len(self.dataset))):
            if j not in self._futures:
                self._futures[j] = self._pool.submit(self.dataset.__getitem__, j)
        fut = self._futures.pop(i, None)
        return fut.result() if fut is not None else self.dataset[i]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="pandaset",
                    choices=["pandaset", "synthetic"])
    ap.add_argument("--root", default="data/pandaset",
                    help="PandaSet tree (ignored for synthetic)")
    ap.add_argument("--out", required=True, help="pack output directory")
    ap.add_argument("--image-size", type=int, nargs=2, default=(256, 256))
    ap.add_argument("--grid-size", type=int, nargs=2, default=(64, 64))
    ap.add_argument("--max-points", type=int, default=5000)
    ap.add_argument("--train-fraction", type=float, default=0.8)
    ap.add_argument("--num-train", type=int, default=800,
                    help="synthetic only")
    ap.add_argument("--num-val", type=int, default=200, help="synthetic only")
    ap.add_argument("--synthetic-difficulty", default="hard")
    ap.add_argument("--workers", type=int, default=2)
    args = ap.parse_args()

    cfg = DataConfig(
        dataset=args.dataset, root=args.root,
        image_size=tuple(args.image_size), grid_size=tuple(args.grid_size),
        max_points=args.max_points, train_fraction=args.train_fraction,
        synthetic_num_train=args.num_train, synthetic_num_val=args.num_val,
        synthetic_difficulty=args.synthetic_difficulty)
    train_ds, val_ds = create_datasets(cfg, verbose=True)
    for split, ds in (("train", train_ds), ("val", val_ds)):
        out = os.path.join(args.out, split)
        t0 = time.perf_counter()
        write_pack(_PrefetchedView(ds, args.workers), out, verbose=True)
        dt = time.perf_counter() - t0
        print(f"{split}: packed {len(ds)} samples -> {out} in {dt:.1f}s "
              f"({len(ds) / max(dt, 1e-9):.1f} samples/s)")
    print(f"train with: --dataset packed --root {args.out}")


if __name__ == "__main__":
    main()
