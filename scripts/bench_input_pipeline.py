#!/usr/bin/env python
"""Input-pipeline benchmark: REAL per-frame decode feeding the chip.

Fabricates PandaSet scenes on disk at realistic raw sizes (1920x1080 JPEG,
~100k-point pickles — the decode cost the synthetic-cached benchmarks never
pay), then trains with the actual loader stack and reports the input-stall
fraction the StallMeter measures per epoch plus end-to-end frames/s.

Answers SURVEY.md §7 hard-part (e): can the 1-thread-per-sample host decode
hide behind the device step, and how much does --num-workers help?

Usage: python scripts/bench_input_pipeline.py [--frames 96] [--batch-size 32]
       [--num-workers N] [--epochs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def fabricate_scenes(root: str, n_frames: int, points_per_frame: int,
                     seed: int = 0) -> None:
    import pandas as pd
    from PIL import Image
    rng = np.random.default_rng(seed)
    per_scene = 16
    for s in range((n_frames + per_scene - 1) // per_scene):
        sid = f"{s:03d}"
        cam = os.path.join(root, sid, "camera", "front_camera")
        lid = os.path.join(root, sid, "lidar")
        seg = os.path.join(root, sid, "annotations", "semseg")
        for d in (cam, lid, seg):
            os.makedirs(d, exist_ok=True)
        for f in range(min(per_scene, n_frames - s * per_scene)):
            fid = f"{f:02d}"
            # Textured image so JPEG decode cost is realistic (flat images
            # compress to nothing and decode instantly).
            img = rng.integers(0, 255, (1080, 1920, 3), np.uint8)
            Image.fromarray(img).save(os.path.join(cam, f"{fid}.jpg"),
                                      quality=85)
            n = points_per_frame
            pd.DataFrame({
                "x": rng.uniform(-80, 80, n).astype(np.float32),
                "y": rng.uniform(-80, 80, n).astype(np.float32),
                "z": rng.uniform(-5, 3, n).astype(np.float32),
                "i": rng.uniform(0, 1, n).astype(np.float32),
            }).to_pickle(os.path.join(lid, f"{fid}.pkl"))
            pd.DataFrame({
                "class": rng.integers(0, 14, n).astype(np.int64)
            }).to_pickle(os.path.join(seg, f"{fid}.pkl"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--root", default=None,
                    help="reuse a fabricated tree instead of building one")
    ap.add_argument("--decode-only", action="store_true",
                    help="measure pure host decode throughput (no model, "
                    "no device): iterate the Batcher and time it — the "
                    "number to compare against the device step time when "
                    "sizing host cores")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lmsu_tpu.config import (DataConfig, ExperimentConfig, ModelConfig,
                                 TrainConfig)
    from lmsu_tpu.data import create_pandaset_datasets, make_loader
    from lmsu_tpu.training import Trainer

    root = args.root
    if root is None:
        root = tempfile.mkdtemp(prefix="pandaset_bench_")
        t0 = time.perf_counter()
        fabricate_scenes(root, args.frames, args.points)
        print(f"fabricated {args.frames} frames ({args.points} pts) "
              f"under {root} in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    if args.decode_only:
        dcfg = DataConfig(dataset="pandaset", root=root,
                          batch_size=args.batch_size,
                          num_workers=args.num_workers)
        train_ds, _ = create_pandaset_datasets(dcfg)
        loader = make_loader(train_ds, args.batch_size, shuffle=True,
                             decode_workers=args.num_workers)
        if len(train_ds) == 0:
            sys.exit("train split is empty — the scene split needs >=2 "
                     "scenes (use --frames >= 32)")
        for epoch in range(args.epochs):
            loader.set_epoch(epoch)
            t0, n = time.perf_counter(), 0
            for batch in loader:
                n += int(batch["sample_mask"].sum())
            dt = time.perf_counter() - t0
            print(f"epoch {epoch}: decode-only {n / dt:.1f} frames/s "
                  f"({dt / n * 1e3:.1f} ms/frame, workers="
                  f"{args.num_workers})", file=sys.stderr)
        print(f"done; scenes left at {root}", file=sys.stderr)
        return

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=2, fusion_type="weighted",
                          fusion_out_channels=128,
                          compute_dtype=jnp.bfloat16 if on_tpu
                          else jnp.float32),
        data=DataConfig(dataset="pandaset", root=root,
                        batch_size=args.batch_size,
                        num_workers=args.num_workers),
        train=TrainConfig(num_epochs=args.epochs, class_weights=(0.4, 3.5),
                          save_dir=tempfile.mkdtemp(prefix="lmsu_ipbench_")))
    train_ds, val_ds = create_pandaset_datasets(cfg.data)
    n_train = len(train_ds)
    trainer = Trainer(
        cfg,
        make_loader(train_ds, cfg.data.batch_size, shuffle=True,
                    decode_workers=args.num_workers),
        make_loader(val_ds, cfg.data.batch_size, shuffle=False,
                    decode_workers=args.num_workers))
    for epoch in range(args.epochs):
        trainer.train_loader.set_epoch(epoch)
        t0 = time.perf_counter()
        loss, metrics = trainer.train_epoch()
        dt = time.perf_counter() - t0
        print(f"epoch {epoch}: {dt:.1f}s  {n_train / dt:.1f} frames/s "
              f"end-to-end (real decode, workers={args.num_workers})  "
              f"input stall {trainer.last_host_stall_frac * 100:.0f}%  "
              f"loss {loss:.4f}", file=sys.stderr)
    print(f"done; scenes left at {root}", file=sys.stderr)


if __name__ == "__main__":
    main()
