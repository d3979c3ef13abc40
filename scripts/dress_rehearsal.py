#!/usr/bin/env python
"""PandaSet-scale feeding dress rehearsal (VERDICT r3 missing #2).

Fabricates a PandaSet tree at REAL raw sizes (1920x1080 JPEG q85,
100k-point pickles, reference scale = 1,920 train + 480 val frames),
then trains the production cached-teacher KD configuration for several
epochs under each feeding mode and measures the input-stall fraction and
end-to-end epoch time:

  raw     : per-epoch JPEG/pickle decode (the reference's behavior,
            pandaset_dataset.py:104-141) — the ~98%-stall baseline
  cache   : DataConfig.decoded_cache — epoch 1 decodes once into host RAM,
            epoch 2+ is a dict lookup (stall -> ~0 from epoch 2)
  packed  : scripts/prepare_dataset.py pre-decoded memmap pack — ~zero
            decode at train time (stall ~0 from epoch 1)

All modes run in ONE process, smallest-first, so remote-TPU compiles are
paid once per distinct program. Publishes the table BASELINE.md cites.

Usage:
  python scripts/dress_rehearsal.py --frames 2400 --epochs 3 \
      [--root DIR] [--modes raw,cache,packed] [--out FILE] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from common import apply_env_platform
    apply_env_platform()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=2400,
                    help="total fabricated frames (80/20 scene split -> "
                    "reference scale at 2400)")
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--scan-steps", type=int, default=8)
    ap.add_argument("--root", default=None,
                    help="reuse a fabricated tree (skips fabrication)")
    ap.add_argument("--modes", default="raw,cache,packed,onchip",
                    help="feeding modes; 'onchip' = TrainConfig."
                    "onchip_epoch over the packed (or decoded-cache) "
                    "dataset: the train/val sets transfer to HBM ONCE "
                    "(uint8 images) and every epoch is one on-chip "
                    "dispatch — the configuration that makes reference-"
                    "scale training chip-bound instead of host-transfer-"
                    "bound (VERDICT r4 weak #2)")
    ap.add_argument("--onchip-contiguous", action="store_true", default=True)
    ap.add_argument("--no-onchip-contiguous", dest="onchip_contiguous",
                    action="store_false")
    ap.add_argument("--cache-hbm-gb", type=float, default=8.0)
    ap.add_argument("--taps", default="post_fusion",
                    help="comma list of KD feature taps. Default keeps the "
                    "teacher cache HBM-resident at reference scale "
                    "(post_fusion alone = ~3.9 GB for 1,920 frames); the "
                    "3-tap default would be 12.1 GB -> host-RAM spill, "
                    "whose per-epoch host->device slice transfer is a "
                    "relay-bandwidth artifact of THIS host, not an input-"
                    "pipeline property")
    ap.add_argument("--tiny", action="store_true",
                    help="small frames/model for CPU smoke testing")
    ap.add_argument("--out", default="/tmp/dress_rehearsal.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_input_pipeline import fabricate_scenes
    from lmsu_tpu.config import (DataConfig, ExperimentConfig, KDConfig,
                                 ModelConfig, TrainConfig,
                                 CameraEncoderConfig, LidarEncoderConfig)
    from lmsu_tpu.data import create_datasets, make_loader, write_pack
    from lmsu_tpu.data.rasterize import make_point_sorter
    from lmsu_tpu.training import DistillationTrainer

    on_tpu = jax.default_backend() not in ("cpu",)

    root = args.root
    if root is None:
        root = tempfile.mkdtemp(prefix="pandaset_dress_")
        t0 = time.perf_counter()
        fabricate_scenes(root, args.frames,
                         args.points if not args.tiny else 2000)
        print(f"fabricated {args.frames} frames under {root} in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    if args.tiny:
        model = ModelConfig(
            num_classes=2, fusion_type="weighted", fusion_out_channels=32,
            camera_fpn_channels=16, camera=CameraEncoderConfig(base_channels=4),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8)))
        image_size, grid, max_points = (32, 32), (8, 8), 512
    else:
        model = ModelConfig(num_classes=2, fusion_type="weighted",
                            fusion_out_channels=128,
                            compute_dtype=jnp.bfloat16 if on_tpu
                            else jnp.float32)
        image_size, grid, max_points = (256, 256), (64, 64), 5000
        if on_tpu:
            import dataclasses
            model = model.replace(lidar=dataclasses.replace(
                model.lidar, scatter_impl="sorted_pallas"))

    base_data = DataConfig(
        dataset="pandaset", root=root, image_size=image_size,
        grid_size=grid, max_points=max_points,
        batch_size=args.batch_size, num_workers=args.num_workers)

    # Pre-decode pack (timed once; amortized over every later epoch/run).
    pack_dir = root.rstrip("/") + "_pack"
    pack_s = None
    if "packed" in args.modes or "onchip" in args.modes:
        if not os.path.exists(os.path.join(pack_dir, "train", "meta.json")):
            from prepare_dataset import _PrefetchedView
            train_ds, val_ds = create_datasets(base_data)
            t0 = time.perf_counter()
            for split, ds in (("train", train_ds), ("val", val_ds)):
                write_pack(_PrefetchedView(ds, args.num_workers),
                           os.path.join(pack_dir, split))
            pack_s = round(time.perf_counter() - t0, 1)
            print(f"packed {len(train_ds)}+{len(val_ds)} samples in "
                  f"{pack_s}s -> {pack_dir}", file=sys.stderr)

    transform = None
    if model.lidar.scatter_impl == "sorted_pallas":
        transform = make_point_sorter(model.lidar.grid_size,
                                      model.lidar.point_cloud_range)

    results = {}
    for mode in args.modes.split(","):
        import dataclasses
        tr_kw = {}
        if mode == "raw":
            data = base_data
        elif mode == "cache":
            data = dataclasses.replace(base_data, decoded_cache=True)
        elif mode == "packed":
            data = dataclasses.replace(base_data, dataset="packed",
                                       root=pack_dir)
        elif mode == "onchip":
            # Feed from the pre-decoded pack (zero decode at materialize
            # time) and run every epoch as one on-chip dispatch: dataset +
            # teacher cache live in HBM (uint8 images, 1,920 frames =
            # ~0.6 GB data + ~4 GB post_fusion cache on 16 GB v5e), the
            # host transfers each array ONCE for the whole run.
            data = dataclasses.replace(base_data, dataset="packed",
                                       root=pack_dir)
            tr_kw = dict(onchip_epoch=True, scan_steps=1,
                         onchip_contiguous=args.onchip_contiguous)
        else:
            raise SystemExit(f"unknown mode {mode!r}")
        train_kw = dict(
            num_epochs=args.epochs, class_weights=(0.4, 3.5),
            scan_steps=args.scan_steps,
            save_dir=os.path.join(tempfile.gettempdir(), f"dress_{mode}"),
            kd=KDConfig(enabled=True, cache_teacher=True,
                        feature_taps=tuple(args.taps.split(",")),
                        cache_hbm_limit_bytes=int(
                            args.cache_hbm_gb * (1 << 30))))
        train_kw.update(tr_kw)
        cfg = ExperimentConfig(model=model, data=data,
                               train=TrainConfig(**train_kw))
        train_ds, val_ds = create_datasets(cfg.data)
        train_loader = make_loader(train_ds, cfg.data.batch_size,
                                   shuffle=True, seed=0,
                                   decode_workers=cfg.data.num_workers,
                                   sample_transform=transform)
        val_loader = make_loader(val_ds, cfg.data.batch_size, shuffle=False,
                                 decode_workers=cfg.data.num_workers,
                                 sample_transform=transform)
        print(f"[{mode}] {len(train_ds)} train / {len(val_ds)} val",
              file=sys.stderr)
        trainer = DistillationTrainer(cfg, train_loader, val_loader)
        t0 = time.perf_counter()
        trainer.train_epoch()  # builds the teacher cache, then epoch 1
        first_epoch_s = time.perf_counter() - t0
        epochs = [{"epoch": 1,
                   "wall_s": round(first_epoch_s, 1),
                   "incl_teacher_cache_fill": True,
                   "stall_frac": round(trainer.last_host_stall_frac, 4)}]
        for e in range(1, args.epochs):
            train_loader.set_epoch(e)
            t0 = time.perf_counter()
            trainer.train_epoch()
            epochs.append(
                {"epoch": e + 1,
                 "wall_s": round(time.perf_counter() - t0, 1),
                 "stall_frac": round(trainer.last_host_stall_frac, 4)})
        n = len(train_ds)
        for row in epochs:
            row["frames_per_sec"] = round(n / row["wall_s"], 1)
        results[mode] = epochs
        print(f"[{mode}] " + "  ".join(
            f"ep{r['epoch']}: {r['wall_s']}s stall {r['stall_frac']:.0%}"
            for r in epochs), file=sys.stderr)
        trainer.flush_checkpoints()

    out = {
        "frames": args.frames, "points_per_frame": args.points,
        "batch_size": args.batch_size, "num_workers": args.num_workers,
        "scan_steps": args.scan_steps, "tiny": args.tiny,
        "backend": "tpu" if on_tpu else "cpu",
        "scatter_impl": model.lidar.scatter_impl,
        "pack_write_s": pack_s,
        "modes": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
