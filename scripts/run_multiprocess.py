#!/usr/bin/env python
"""REAL multi-process data-parallel execution check (VERDICT r2 next #3).

Before round 3, the multi-host contract (per-process stripe decoding in
data/pipeline.py, the jax.make_array_from_process_local_data branch in
parallel/mesh.py, the host-spilled teacher cache's replicated teacher
forward in training/distill.py) was pinned only by index-math tests and a
single-process dry run — none of it had ever executed with
jax.process_count() > 1. This script actually runs it:

  * launcher mode (default): spawns N worker subprocesses of this same
    file, each `jax.distributed.initialize`-d into one job over gloo CPU
    collectives (and forced host devices), plus ONE single-process
    reference worker with the same TOTAL device count; then asserts
      - every distributed process reports identical (replicated) results,
      - the distributed result matches the single-process reference,
      - the processes decoded disjoint stripes covering every sample;
  * worker mode (--process-id): one KD training epoch + validation on
    tiny shapes through the full production path — Batcher stripe
    decoding, global-batch assembly, teacher-cache fill forced onto the
    host-RAM spill path (cache_hbm_limit_bytes=0), precached KD steps.

Round 4 (VERDICT r3 weak #4): the teacher partitionings and the Pallas
kernels had only ever executed single-process; --teacher-partition fsdp
runs the ZeRO-3 data-axis weight sharding (the likeliest to misbehave under
process_count() > 1: weight storage sharded over the same axis the
process-local batches ride) and --scatter-impl sorted_pallas runs the
custom_partitioning Mosaic kernel, both under real multi-process.

Usage:
  python scripts/run_multiprocess.py              # 2 processes x 4 devices
  python scripts/run_multiprocess.py --num-processes 4 \
      --teacher-partition fsdp --scatter-impl sorted_pallas
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

DEVICES_TOTAL = 8  # global mesh size, split evenly across processes
PORT = 29761


def worker(args) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    per_proc = DEVICES_TOTAL // args.num_processes
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_proc}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        # Offset the port by job size so back-to-back 2- and 4-process
        # runs (the test suite) never collide on a lingering socket.
        jax.distributed.initialize(f"localhost:{PORT + args.num_processes}",
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == DEVICES_TOTAL

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    from lmsu_tpu.config import (CameraEncoderConfig, DataConfig,
                                 ExperimentConfig, KDConfig,
                                 LidarEncoderConfig, MeshConfig, ModelConfig,
                                 TrainConfig)
    from lmsu_tpu.data import SyntheticMultiModalDataset, make_loader
    from lmsu_tpu.parallel.mesh import make_mesh, process_data_stripes
    from lmsu_tpu.training import DistillationTrainer

    batch = 2 * DEVICES_TOTAL  # 2 samples per device, globally
    n_train = 2 * batch        # 2 optimizer steps per epoch
    cfg = ExperimentConfig(
        model=ModelConfig(
            num_classes=2, fusion_type="concat", fusion_out_channels=32,
            camera_fpn_channels=16,
            camera=CameraEncoderConfig(base_channels=4),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8),
                                     scatter_impl=args.scatter_impl)),
        data=DataConfig(dataset="synthetic", synthetic_num_train=n_train,
                        synthetic_num_val=batch, image_size=(32, 32),
                        grid_size=(8, 8), max_points=64, batch_size=batch),
        train=TrainConfig(
            num_epochs=1, class_weights=(0.4, 3.5),
            save_dir=os.path.join(tempfile.gettempdir(),
                                  f"lmsu_mp_{args.process_id}"),
            kd=KDConfig(enabled=True,
                        feature_taps=("camera_feat", "post_fusion"),
                        cache_teacher=True,
                        teacher_partition=args.teacher_partition,
                        # Force the host-RAM spill path (distill.py): the
                        # replicated teacher_forward + per-step numpy
                        # gather is the multi-host production path.
                        cache_hbm_limit_bytes=0)))

    mesh = make_mesh(MeshConfig(model_parallel=args.model_parallel))
    assert mesh.devices.size == DEVICES_TOTAL
    # Loader striping must follow the mesh topology, not process_count:
    # when the model axis spans processes (devices/process < model
    # parallel), the processes of one model group address the SAME batch
    # rows and must decode IDENTICAL stripes (parallel/mesh.py).
    num_stripes, stripe_index = process_data_stripes(mesh)

    ds = SyntheticMultiModalDataset(
        num_samples=n_train, image_size=cfg.data.image_size,
        grid_size=cfg.data.grid_size, max_points=cfg.data.max_points)
    val_ds = SyntheticMultiModalDataset(
        num_samples=batch, image_size=cfg.data.image_size,
        grid_size=cfg.data.grid_size, max_points=cfg.data.max_points,
        seed=10_000)
    # make_loader defaults shard to (process_count, process_index): each
    # process DECODES only its stripe of every global batch.
    transform = None
    if args.scatter_impl == "sorted_pallas":
        # The sorted-input kernel's host-side contract (scripts/common.py
        # build_loaders does the same).
        from lmsu_tpu.data.rasterize import make_point_sorter
        transform = make_point_sorter(cfg.model.lidar.grid_size,
                                      cfg.model.lidar.point_cloud_range)
    train_loader = make_loader(ds, batch, shuffle=False,
                               sample_transform=transform,
                               num_shards=num_stripes,
                               shard_index=stripe_index)
    val_loader = make_loader(val_ds, batch, shuffle=False,
                             sample_transform=transform,
                             num_shards=num_stripes,
                             shard_index=stripe_index)

    # Record which samples this process actually decoded (stripe check).
    decoded = sorted(
        int(i) for b in train_loader.batcher for i in b["sample_index"])

    trainer = DistillationTrainer(cfg, train_loader, val_loader, mesh=mesh)
    train_loss, train_metrics = trainer.train_epoch()
    assert trainer.teacher_cache_host is not None, \
        "expected the host-RAM teacher-cache spill path"
    val_loss, val_metrics = trainer.validate()

    if args.teacher_partition == "fsdp" or (
            args.teacher_partition == "tp" and args.model_parallel > 1):
        # The teacher weights must actually be sharded (over the data axis
        # for fsdp, the model axis for tp), not silently replicated.
        leaves = jax.tree_util.tree_leaves(trainer.teacher_variables)
        sharded = [x for x in leaves
                   if hasattr(x, "sharding")
                   and not x.sharding.is_fully_replicated]
        assert sharded, (f"{args.teacher_partition} teacher: no weight "
                         "leaf is actually sharded")
    if args.teacher_partition == "sp":
        assert trainer._teacher_sp_sharding is not None, \
            "sp teacher: spatial input sharding not installed"

    result = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "teacher_partition": args.teacher_partition,
        "scatter_impl": args.scatter_impl,
        "model_parallel": args.model_parallel,
        "num_stripes": num_stripes,
        "stripe_index": stripe_index,
        "decoded_indices": decoded,
        "train_loss": float(train_loss),
        "train_miou": float(train_metrics["miou"]),
        "val_loss": float(val_loss),
        "val_miou": float(val_metrics["miou"]),
        "loss_parts": {k: float(v)
                       for k, v in trainer.last_loss_parts.items()},
    }
    with open(args.output, "w") as f:
        json.dump(result, f)
    print(f"worker {args.process_id}/{args.num_processes}: "
          f"train loss {train_loss:.6f} val mIoU {val_metrics['miou']:.4f}")


def launch(args) -> dict:
    tmp = tempfile.mkdtemp(prefix="lmsu_mp_")
    script = os.path.abspath(__file__)

    def spawn(pid, nproc):
        out = os.path.join(tmp, f"result_p{pid}_of_{nproc}.json")
        proc = subprocess.Popen(
            [sys.executable, script, "--process-id", str(pid),
             "--num-processes", str(nproc), "--output", out,
             "--teacher-partition", args.teacher_partition,
             "--scatter-impl", args.scatter_impl,
             "--model-parallel", str(args.model_parallel)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        return proc, out

    n = args.num_processes
    print(f"launching {n} distributed workers "
          f"({DEVICES_TOTAL // n} devices each) ...")
    procs = [spawn(i, n) for i in range(n)]
    logs = []
    for proc, _ in procs:
        stdout, _ = proc.communicate(timeout=1200)
        logs.append(stdout)
        if proc.returncode != 0:
            print("\n".join(logs))
            raise RuntimeError(f"worker failed (rc={proc.returncode})")
    dist = [json.load(open(out)) for _, out in procs]

    print("launching single-process reference (same 8-device mesh) ...")
    ref_proc, ref_out = spawn(0, 1)
    stdout, _ = ref_proc.communicate(timeout=1200)
    if ref_proc.returncode != 0:
        print(stdout)
        raise RuntimeError("reference worker failed")
    ref = json.load(open(ref_out))

    # 1. replicated results agree across processes (same global program)
    for r in dist[1:]:
        for k in ("train_loss", "val_loss", "train_miou", "val_miou"):
            assert abs(r[k] - dist[0][k]) < 1e-6, (k, r[k], dist[0][k])

    # 2. stripe topology: processes sharing a stripe (model axis spanning
    #    processes) decoded IDENTICAL rows; distinct stripes are disjoint
    #    and together cover the dataset exactly once.
    n_train = len(ref["decoded_indices"])
    num_stripes = dist[0]["num_stripes"]
    by_stripe = {}
    for r in dist:
        prev = by_stripe.setdefault(r["stripe_index"], r["decoded_indices"])
        assert prev == r["decoded_indices"], \
            "replica processes decoded different rows"
    assert len(by_stripe) == num_stripes
    all_idx = sorted(i for idxs in by_stripe.values() for i in idxs)
    assert all_idx == list(range(n_train)), \
        "stripes overlap or miss samples"
    per_stripe = n_train // num_stripes
    for idxs in by_stripe.values():
        assert len(idxs) == per_stripe

    # 3. distributed == single-process (same mesh size; only the collective
    #    implementation differs, so allow fp noise)
    for k in ("train_loss", "val_loss"):
        rel = abs(dist[0][k] - ref[k]) / max(abs(ref[k]), 1e-12)
        assert rel < 1e-4, (k, dist[0][k], ref[k])
    for k in ("train_miou", "val_miou"):
        assert abs(dist[0][k] - ref[k]) < 1e-6, (k, dist[0][k], ref[k])

    summary = {
        "num_processes": n,
        "devices_total": DEVICES_TOTAL,
        "teacher_partition": args.teacher_partition,
        "scatter_impl": args.scatter_impl,
        "model_parallel": args.model_parallel,
        "num_stripes": dist[0]["num_stripes"],
        "model_axis_spans_processes": (
            args.model_parallel > DEVICES_TOTAL // n),
        "train_loss_distributed": dist[0]["train_loss"],
        "train_loss_single": ref["train_loss"],
        "val_miou_distributed": dist[0]["val_miou"],
        "val_miou_single": ref["val_miou"],
        "stripes_disjoint_and_complete": True,
        "host_spill_teacher_cache": True,
    }
    print("OK — multi-process result matches single-process:")
    print(json.dumps(summary, indent=2))
    return summary


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--teacher-partition", default="tp",
                   choices=["tp", "sp", "fsdp"],
                   help="KDConfig.teacher_partition for the worker's KD "
                   "trainer ('tp' on the 1-D mesh = replicated teacher, "
                   "the round-3 behavior; 'fsdp' shards teacher weight "
                   "storage over the data axis)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="MeshConfig.model_parallel: builds a 2-D "
                   "('data','model') mesh. With model_parallel > "
                   "devices-per-process the model axis SPANS process "
                   "boundaries — tp all-gathers and sp halo exchanges "
                   "ride the inter-process collectives, and the processes "
                   "of one model group decode identical batch stripes")
    p.add_argument("--scatter-impl", default="xla",
                   choices=["xla", "xla_fastbwd", "sorted", "pallas",
                            "sorted_pallas"],
                   help="BEV scatter implementation (sorted_pallas runs "
                   "the custom_partitioning Mosaic kernel, interpret mode "
                   "on CPU)")
    args = p.parse_args(argv)
    if args.process_id is not None:
        worker(args)
    else:
        if DEVICES_TOTAL % args.num_processes:
            p.error(f"--num-processes must divide {DEVICES_TOTAL}")
        launch(args)


if __name__ == "__main__":
    main()
