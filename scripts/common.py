"""Shared CLI plumbing for the entry-point scripts."""

from __future__ import annotations

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")  # run from repo root without installation

from lmsu_tpu.config import ExperimentConfig
from lmsu_tpu.data import create_datasets, make_loader
from lmsu_tpu.parallel.mesh import make_mesh


def apply_env_platform() -> None:
    """Honor the JAX_PLATFORMS env var *exactly*.

    On this image the axon TPU plugin registers itself at interpreter start
    and prepends its platform, so `JAX_PLATFORMS=cpu python script.py`
    resolves to "axon,cpu" — the script still tries to initialize the TPU
    first, and a wedged relay hangs it forever instead of falling back.
    Calling this at main() start pins the platform list to the env value
    (no-op when the variable is unset)."""
    import os
    p = os.environ.get("JAX_PLATFORMS")
    if p:
        import jax
        jax.config.update("jax_platforms", p)


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data-root", default=None,
                   help="PandaSet root (scene dirs); default per config")
    p.add_argument("--dataset", default=None,
                   choices=["pandaset", "synthetic", "packed"],
                   help="'packed' trains from pre-decoded memmap packs "
                   "(scripts/prepare_dataset.py); --data-root is the pack "
                   "directory")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--save-dir", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--num-train", type=int, default=None,
                   help="synthetic dataset: #train samples")
    p.add_argument("--num-val", type=int, default=None)
    p.add_argument("--difficulty", default=None, choices=["easy", "hard"],
                   help="synthetic dataset difficulty: 'easy' saturates "
                   "(plumbing checks); 'hard' is the discriminative "
                   "benchmark (data/synthetic.py)")
    p.add_argument("--resume", action="store_true",
                   help="resume from <save_dir>/latest.ckpt if present")
    p.add_argument("--scan-steps", type=int, default=None,
                   help="chain K train steps per dispatch (lax.scan)")
    p.add_argument("--onchip-epoch", action="store_true",
                   help="run each train epoch as one lax.scan over an "
                   "HBM-resident copy of the train set")
    p.add_argument("--onchip-eval", action="store_true",
                   help="require on-chip validation passes too (default: "
                   "follows --onchip-epoch when the val loader supports "
                   "it; TrainConfig.onchip_eval)")
    p.add_argument("--progress", action="store_true",
                   help="per-step tqdm progress bars (reference "
                   "trainer.py:81 analog)")
    p.add_argument("--decoded-cache", action="store_true",
                   help="cache decoded PandaSet samples in host RAM "
                   "(~0.3 MB/sample): epoch 2+ pays no JPEG/pickle decode "
                   "(DataConfig.decoded_cache)")
    p.add_argument("--num-workers", type=int, default=None,
                   help="parallel per-sample decode threads in the input "
                   "pipeline (reference DataLoader num_workers analog); "
                   "default per DataConfig")
    p.add_argument("--lidar-encoder", default=None,
                   choices=["spatial", "pointpillars"],
                   help="LiDAR encoder implementation (reference "
                   "lidar_encoder.py:193 encoder_type)")
    p.add_argument("--fusion-type", default=None,
                   choices=["concat", "minimal", "weighted", "gated_sum"],
                   help="override the script's fusion variant (single-run "
                   "scripts; the ablation sweep sets its own)")
    p.add_argument("--fusion-channels", type=int, default=None,
                   help="override ModelConfig.fusion_out_channels")
    p.add_argument("--scatter-impl", default=None,
                   choices=["xla", "xla_fastbwd", "sorted", "pallas",
                            "sorted_pallas"],
                   help="BEV scatter-max algorithm (LidarEncoderConfig."
                   "scatter_impl); 'sorted_pallas' also turns on the "
                   "pipeline's by-cell point sorting")
    p.add_argument("--model-parallel", type=int, default=None,
                   help="size of a second ('model') mesh axis — builds a "
                   "2-D ('data','model') mesh; the KD teacher is tensor- "
                   "or spatially-partitioned over it (parallel/tp.py, "
                   "KDConfig.teacher_partition); other paths replicate. "
                   "Not needed for --teacher-partition fsdp, which shards "
                   "teacher weight storage over the data axis")
    p.add_argument("--grad-clip-norm", type=float, default=None,
                   help="clip gradients to this global L2 norm")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="maintain an EMA of the params on-chip; validation/"
                   "best-checkpoint/inference use the EMA weights")
    p.add_argument("--snapshot-every", type=int, default=None,
                   help="every N epochs also write an immutable "
                   "epoch_###.ckpt (TrainConfig.snapshot_every) — feeds "
                   "post-hoc analysis and snapshot-ensemble teachers "
                   "(--teacher-checkpoint each snapshot)")
    p.add_argument("--handle-sigterm", action="store_true",
                   help="on SIGTERM finish the current epoch, write + "
                   "flush latest.ckpt and exit cleanly "
                   "(TrainConfig.handle_sigterm) — for preemptible fleets")
    p.add_argument("--async-checkpoint", action="store_true",
                   help="write checkpoints from a background thread "
                   "(TrainConfig.async_checkpoint): D2H transfer, "
                   "serialization and disk IO overlap the next epoch")
    p.add_argument("--augment", action="store_true",
                   help="enable the standard device-side augmentation "
                   "recipe: hflip 0.5, brightness/contrast 0.1, image "
                   "noise 0.02, point dropout 0.05 (ops/augment.py; "
                   "individual knobs via --aug-*)")
    p.add_argument("--aug-hflip", type=float, default=None,
                   help="lateral mirror probability (implies --augment)")
    p.add_argument("--aug-brightness", type=float, default=None)
    p.add_argument("--aug-contrast", type=float, default=None)
    p.add_argument("--aug-image-noise", type=float, default=None)
    p.add_argument("--aug-point-dropout", type=float, default=None)
    p.add_argument("--aug-point-jitter-xy", type=float, default=None)
    p.add_argument("--aug-flip-image-mode", default=None,
                   choices=["aligned", "mirror"],
                   help="'aligned' for top-down-aligned cameras "
                   "(synthetic), 'mirror' for perspective cameras")


#: The standard augmentation recipe --augment enables (see ops/augment.py;
#: hflip requires a non-sorted scatter impl — check_augment_compat enforces).
STANDARD_AUGMENT = dict(enabled=True, hflip_prob=0.5, brightness=0.1,
                        contrast=0.1, image_noise_std=0.02,
                        point_dropout=0.05)


def _augment_from_args(args):
    """Build an AugmentConfig from --augment/--aug-* flags (None if off)."""
    from lmsu_tpu.config import AugmentConfig
    knobs = {"hflip_prob": getattr(args, "aug_hflip", None),
             "brightness": getattr(args, "aug_brightness", None),
             "contrast": getattr(args, "aug_contrast", None),
             "image_noise_std": getattr(args, "aug_image_noise", None),
             "point_dropout": getattr(args, "aug_point_dropout", None),
             "point_jitter_xy": getattr(args, "aug_point_jitter_xy", None),
             "flip_image_mode": getattr(args, "aug_flip_image_mode", None)}
    explicit = {k: v for k, v in knobs.items() if v is not None}
    if not getattr(args, "augment", False) and not explicit:
        return None
    base = dict(STANDARD_AUGMENT) if getattr(args, "augment", False) \
        else {"enabled": True}
    base.update(explicit)
    return AugmentConfig(**base)


def apply_overrides(cfg: ExperimentConfig, args) -> ExperimentConfig:
    data_kw, train_kw = {}, {}
    aug = _augment_from_args(args)
    if aug is not None:
        train_kw["augment"] = aug
    if args.data_root is not None:
        data_kw["root"] = args.data_root
    if args.dataset is not None:
        data_kw["dataset"] = args.dataset
    if args.batch_size is not None:
        data_kw["batch_size"] = args.batch_size
    if args.num_train is not None:
        data_kw["synthetic_num_train"] = args.num_train
    if args.num_val is not None:
        data_kw["synthetic_num_val"] = args.num_val
    if getattr(args, "difficulty", None) is not None:
        data_kw["synthetic_difficulty"] = args.difficulty
    if getattr(args, "num_workers", None) is not None:
        data_kw["num_workers"] = args.num_workers
    if getattr(args, "decoded_cache", False):
        data_kw["decoded_cache"] = True
    if args.epochs is not None:
        train_kw["num_epochs"] = args.epochs
    if args.lr is not None:
        train_kw["lr"] = args.lr
    if args.save_dir is not None:
        train_kw["save_dir"] = args.save_dir
    if args.seed is not None:
        train_kw["seed"] = args.seed
    if getattr(args, "scan_steps", None) is not None:
        train_kw["scan_steps"] = args.scan_steps
    if getattr(args, "grad_clip_norm", None) is not None:
        train_kw["grad_clip_norm"] = args.grad_clip_norm
    if getattr(args, "ema_decay", None) is not None:
        train_kw["ema_decay"] = args.ema_decay
    if getattr(args, "async_checkpoint", False):
        train_kw["async_checkpoint"] = True
    if getattr(args, "handle_sigterm", False):
        train_kw["handle_sigterm"] = True
    if getattr(args, "snapshot_every", None) is not None:
        train_kw["snapshot_every"] = args.snapshot_every
    if getattr(args, "onchip_epoch", False):
        train_kw["onchip_epoch"] = True
    if getattr(args, "onchip_eval", False):
        train_kw["onchip_eval"] = True
    if getattr(args, "progress", False):
        train_kw["progress"] = True
    model = cfg.model
    if getattr(args, "lidar_encoder", None) is not None:
        model = model.replace(lidar=dataclasses.replace(
            model.lidar, encoder_type=args.lidar_encoder))
    if getattr(args, "fusion_type", None) is not None:
        model = model.replace(fusion_type=args.fusion_type)
    if getattr(args, "fusion_channels", None) is not None:
        model = model.replace(fusion_out_channels=args.fusion_channels)
    if getattr(args, "scatter_impl", None) is not None:
        model = model.replace(lidar=dataclasses.replace(
            model.lidar, scatter_impl=args.scatter_impl))
    mesh = cfg.mesh
    if getattr(args, "model_parallel", None) is not None:
        mesh = dataclasses.replace(mesh, model_parallel=args.model_parallel)
    return cfg.replace(
        model=model,
        data=dataclasses.replace(cfg.data, **data_kw),
        train=dataclasses.replace(cfg.train, **train_kw),
        mesh=mesh)


def build_loaders(cfg: ExperimentConfig, verbose: bool = True):
    train_ds, val_ds = create_datasets(cfg.data, verbose=verbose)
    transform = None
    if cfg.model.lidar.scatter_impl == "sorted_pallas":
        # The sorted-input kernel's contract: points ordered by BEV cell
        # (data/rasterize.py; order-invariant for every other impl too).
        from lmsu_tpu.data.rasterize import make_point_sorter
        transform = make_point_sorter(cfg.model.lidar.grid_size,
                                      cfg.model.lidar.point_cloud_range)
    train_loader = make_loader(train_ds, cfg.data.batch_size,
                               shuffle=cfg.data.shuffle_train,
                               seed=cfg.train.seed,
                               decode_workers=cfg.data.num_workers,
                               sample_transform=transform)
    val_loader = make_loader(val_ds, cfg.data.batch_size, shuffle=False,
                             decode_workers=cfg.data.num_workers,
                             sample_transform=transform)
    print(f"Dataset: {cfg.data.dataset} — {len(train_ds)} train / "
          f"{len(val_ds)} val samples")
    return train_loader, val_loader


def maybe_resume(trainer, cfg: ExperimentConfig, resume: bool) -> int:
    import os
    latest = os.path.join(cfg.train.save_dir, "latest.ckpt")
    if resume and os.path.exists(latest):
        return trainer.load_checkpoint(latest)
    return 0
