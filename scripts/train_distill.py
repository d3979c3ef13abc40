#!/usr/bin/env python
"""Teacher->student knowledge-distillation training — the flagship run.

The capability the reference names itself after but never implements
(SURVEY.md §0). Two phases:
  1. (optional, --train-teacher) train the 2x-wide teacher to convergence;
  2. distill into the standard student: CE + logit KL + feature matching on
     the camera_feat/lidar_feat/post_fusion taps.
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")

from scripts.common import (add_common_args, apply_overrides, build_loaders,
                            maybe_resume,
                            apply_env_platform)

from lmsu_tpu.config import (ExperimentConfig, KDConfig, ModelConfig,
                             TrainConfig, teacher_config)
from lmsu_tpu.training import DistillationTrainer, Trainer


def build_configs(args):
    """Resolve the parsed CLI into (student ExperimentConfig, teacher
    ModelConfig). Teacher width is anchored to the REFERENCE-size model, so
    the teacher config is computed before any --width student shrink."""
    ckpts = args.teacher_checkpoint or []
    kd = KDConfig(enabled=True, temperature=args.temperature,
                  alpha_kl=args.alpha_kl, beta_feature=args.beta_feature,
                  teacher_width_mult=args.teacher_width,
                  teacher_checkpoint=ckpts[0] if len(ckpts) == 1 else None,
                  teacher_checkpoints=(tuple(ckpts) if len(ckpts) > 1
                                       else None),
                  ensemble_size=(args.num_teachers
                                 if not ckpts else 1),
                  use_pallas=args.use_pallas_kd,
                  cache_teacher=args.cache_teacher)
    if args.cache_hbm_gb is not None:
        kd = dataclasses.replace(
            kd, cache_hbm_limit_bytes=int(args.cache_hbm_gb * (1 << 30)))
    if args.teacher_partition is not None:
        if (args.teacher_partition in ("tp", "sp")
                and (getattr(args, "model_parallel", None) or 1) <= 1):
            raise SystemExit(
                f"--teacher-partition {args.teacher_partition} needs "
                f"--model-parallel > 1 (it shards over the 'model' mesh "
                f"axis); use 'fsdp' to shard over the data axis instead.")
        kd = dataclasses.replace(kd, teacher_partition=args.teacher_partition)
    if args.cache_dtype is not None:
        kd = dataclasses.replace(kd, cache_dtype=args.cache_dtype)
    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=2, fusion_type="weighted",
                          fusion_out_channels=128),
        train=TrainConfig(num_epochs=20, class_weights=(0.4, 3.5),
                          save_dir="checkpoints/distill_student", kd=kd))
    cfg = apply_overrides(cfg, args)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, kd=kd))

    tcfg_model = teacher_config(cfg.model, args.teacher_width)
    if args.teacher_lidar_encoder is not None:
        tcfg_model = tcfg_model.replace(lidar=dataclasses.replace(
            tcfg_model.lidar, encoder_type=args.teacher_lidar_encoder))
    if args.width != 1.0:
        cfg = cfg.replace(model=teacher_config(cfg.model, args.width))
    return cfg, tcfg_model


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--teacher-checkpoint", action="append", default=None,
                   help="trained teacher .ckpt (else random teacher); "
                        "repeat the flag for a deep-ensemble teacher "
                        "(member-averaged logits/taps — KDConfig."
                        "teacher_checkpoints)")
    p.add_argument("--train-teacher", action="store_true",
                   help="train the teacher first, then distill")
    p.add_argument("--num-teachers", type=int, default=1,
                   help="with --train-teacher: train this many ensemble "
                        "members (data-order/init seeds offset by 1000 "
                        "each) and distill from their average")
    p.add_argument("--teacher-epochs", type=int, default=None)
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--alpha-kl", type=float, default=0.5)
    p.add_argument("--beta-feature", type=float, default=0.5)
    p.add_argument("--teacher-width", type=float, default=2.0,
                   help="teacher width multiplier, relative to the "
                        "REFERENCE-size (width-1) model — independent of "
                        "--width, so '--width 0.5 --teacher-width 2' "
                        "distills a half-width student from the standard "
                        "2x teacher")
    p.add_argument("--width", type=float, default=1.0,
                   help="STUDENT width multiplier (teacher_config scaling "
                        "of every channel dimension; 1.0 = reference size) "
                        "— the compression knob measured in "
                        "kd_compression_results.json")
    p.add_argument("--teacher-lidar-encoder", default=None,
                   choices=["spatial", "pointpillars"],
                   help="teacher LiDAR encoder when it differs from the "
                        "student's (cross-architecture KD: both encoders "
                        "emit [B,H,W,C] BEV maps, so the learned feature "
                        "projections are encoder-agnostic)")
    p.add_argument("--use-pallas-kd", action="store_true")
    p.add_argument("--cache-teacher", action="store_true",
                   help="precompute frozen-teacher outputs once (HBM cache)")
    p.add_argument("--cache-dtype", default=None,
                   choices=["auto", "bfloat16"],
                   help="teacher-cache storage dtype (KDConfig.cache_dtype);"
                   " bfloat16 halves the cache for very wide teachers")
    p.add_argument("--teacher-partition", default=None,
                   choices=["tp", "sp", "fsdp"],
                   help="how the teacher shards over the mesh: 'tp' "
                   "channel-shards the weights / 'sp' shards activations "
                   "on H (both over the 'model' axis, need "
                   "--model-parallel > 1); 'fsdp' storage-shards the "
                   "weights over the DATA axis, ZeRO-3 style (works on "
                   "the plain 1-D mesh) (KDConfig.teacher_partition)")
    p.add_argument("--cache-hbm-gb", type=float, default=None,
                   help="HBM budget for the teacher cache in GiB "
                   "(KDConfig.cache_hbm_limit_bytes, default 4); larger "
                   "caches spill to host RAM with a per-step gather — "
                   "raise this when the cache fits next to the model "
                   "(v5e: 16 GiB) to avoid re-transferring it every epoch")
    return p


def main(argv=None) -> float:
    apply_env_platform()
    args = make_parser().parse_args(argv)

    cfg, tcfg_model = build_configs(args)

    teacher_vars = None
    if args.train_teacher:
        members = []
        for i in range(max(1, args.num_teachers)):
            suffix = "_teacher" if i == 0 else f"_teacher{i}"
            tcfg = cfg.replace(
                model=tcfg_model,
                train=dataclasses.replace(
                    cfg.train, kd=KDConfig(enabled=False),
                    # Ensemble members differ in init AND data order.
                    seed=cfg.train.seed + 1000 * i,
                    num_epochs=(args.teacher_epochs
                                if args.teacher_epochs is not None
                                else cfg.train.num_epochs),
                    save_dir=cfg.train.save_dir + suffix))
            print(f"=== Phase 1: training teacher "
                  f"{i + 1}/{max(1, args.num_teachers)} ===")
            tl, vl = build_loaders(tcfg)
            t_trainer = Trainer(tcfg, tl, vl)
            t_best = t_trainer.train()
            print(f"Teacher {i + 1} best mIoU: {t_best:.4f}")
            import jax
            state = jax.device_get(t_trainer.state)
            members.append({"params": state.params,
                            "batch_stats": state.batch_stats})
        teacher_vars = members if len(members) > 1 else members[0]

    print("=== Distilling student ===")
    train_loader, val_loader = build_loaders(cfg)
    trainer = DistillationTrainer(cfg, train_loader, val_loader,
                                  teacher_variables=teacher_vars,
                                  teacher_model_config=tcfg_model)
    start_epoch = maybe_resume(trainer, cfg, args.resume)
    best = trainer.train(start_epoch)
    print(f"Student best val mIoU: {best:.4f}")
    if trainer.last_loss_parts:
        print("Final loss parts:", trainer.last_loss_parts)
    return best


if __name__ == "__main__":
    main()
