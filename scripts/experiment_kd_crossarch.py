#!/usr/bin/env python
"""Cross-architecture KD: spatial-encoder teacher -> PointPillars student.

The KD taps contract (camera_feat / lidar_feat / post_fusion, reference
fusion_module.py:234,260-262) is encoder-agnostic — every LiDAR encoder
emits a [B, H, W, C] BEV map — so distillation should transfer across
LiDAR encoder architectures, not just across widths. This experiment
measures that claim on the hard synthetic benchmark (same regime as
experiment_kd_lift.py: low-data, 40 epochs, arms paired per seed).

Per seed:
  1. teacher     — 2x-wide SPATIAL-encoder model, trained on labels alone;
  2. pp_student  — standard-width POINTPILLARS-encoder model, labels alone;
  3. pp_student_kd — the same PointPillars student distilled from THIS
     seed's spatial teacher (CE + logit KL + feature matching; the
     heterogeneous-teacher path of scripts/train_distill.py
     --teacher-lidar-encoder).

Writes kd_crossarch_results.json with per-seed arms, paired KD gaps, and
the verdict bit (positive gap on every seed).
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")

from scripts.common import add_common_args, apply_overrides, build_loaders, apply_env_platform

from lmsu_tpu.config import (DataConfig, ExperimentConfig, KDConfig,
                             ModelConfig, TrainConfig, teacher_config)
from lmsu_tpu.training import DistillationTrainer, Trainer


def _base_config(args) -> ExperimentConfig:
    """Identical regime to experiment_kd_lift.py so the spatial-student
    numbers there are directly comparable."""
    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=2, fusion_type="weighted",
                          fusion_out_channels=128),
        data=DataConfig(dataset="synthetic", synthetic_difficulty="hard",
                        synthetic_num_train=400, synthetic_num_val=512,
                        batch_size=32),
        train=TrainConfig(num_epochs=40, class_weights=(0.4, 3.5),
                          onchip_epoch=True,
                          save_dir="checkpoints/kd_crossarch"))
    return apply_overrides(cfg, args)


def _pp_model(model: ModelConfig) -> ModelConfig:
    return model.replace(lidar=dataclasses.replace(
        model.lidar, encoder_type="pointpillars"))


def _train(cfg: ExperimentConfig, trainer_cls, **trainer_kw) -> tuple:
    train_loader, val_loader = build_loaders(cfg)
    trainer = trainer_cls(cfg, train_loader, val_loader, **trainer_kw)
    best = trainer.train()
    return best, trainer


def run_seed(seed: int, args) -> dict:
    base = _base_config(args)
    out = {}

    # -- 1. teacher: 2x-wide, SPATIAL lidar encoder ------------------------
    tmodel = teacher_config(base.model, args.teacher_width)
    tcfg = base.replace(
        model=tmodel,
        train=dataclasses.replace(
            base.train, seed=seed,
            num_epochs=args.teacher_epochs or base.train.num_epochs,
            save_dir=f"checkpoints/kd_crossarch_teacher_s{seed}"))
    print(f"\n=== seed {seed}: spatial teacher (x{args.teacher_width}) ===",
          flush=True)
    t_best, t_trainer = _train(tcfg, Trainer)
    out["teacher_spatial"] = t_best

    import jax
    t_state = jax.device_get(t_trainer.state)
    teacher_vars = {"params": t_state.params,
                    "batch_stats": t_state.batch_stats}
    del t_trainer

    # -- 2. PointPillars student alone -------------------------------------
    smodel = _pp_model(base.model)
    scfg = base.replace(
        model=smodel,
        train=dataclasses.replace(
            base.train, seed=seed,
            save_dir=f"checkpoints/kd_crossarch_pp_student_s{seed}"))
    print(f"\n=== seed {seed}: PointPillars student alone ===", flush=True)
    s_best, s_trainer = _train(scfg, Trainer)
    out["pp_student"] = s_best
    del s_trainer

    # -- 3. PointPillars student distilled from the spatial teacher --------
    kd = KDConfig(enabled=True, temperature=args.temperature,
                  alpha_kl=args.alpha_kl, beta_feature=args.beta_feature,
                  teacher_width_mult=args.teacher_width)
    kcfg = base.replace(
        model=smodel,
        train=dataclasses.replace(
            base.train, seed=seed, kd=kd,
            save_dir=f"checkpoints/kd_crossarch_pp_student_kd_s{seed}"))
    print(f"\n=== seed {seed}: PP student + KD from spatial teacher ===",
          flush=True)
    k_best, k_trainer = _train(kcfg, DistillationTrainer,
                               teacher_variables=teacher_vars,
                               teacher_model_config=tmodel)
    out["pp_student_kd"] = k_best
    del k_trainer

    print(f"\nseed {seed}: teacher(spatial) {out['teacher_spatial']:.4f}  "
          f"pp_student {out['pp_student']:.4f}  "
          f"pp_student+KD {out['pp_student_kd']:.4f}", flush=True)
    return out


def summarize(per_seed: dict, args) -> dict:
    arms = ("teacher_spatial", "pp_student", "pp_student_kd")
    mean = {a: sum(r[a] for r in per_seed.values()) / len(per_seed)
            for a in arms}
    spread = {a: max(r[a] for r in per_seed.values())
              - min(r[a] for r in per_seed.values()) for a in arms}
    gaps = {s: r["pp_student_kd"] - r["pp_student"]
            for s, r in per_seed.items()}
    base = _base_config(args)
    results = {
        "benchmark": "synthetic_hard",
        "experiment": "cross_architecture_kd",
        "teacher_lidar_encoder": "spatial",
        "student_lidar_encoder": "pointpillars",
        "config": {"num_train": base.data.synthetic_num_train,
                   "num_val": base.data.synthetic_num_val,
                   "epochs": base.train.num_epochs,
                   "batch_size": base.data.batch_size,
                   "teacher_width": args.teacher_width,
                   "temperature": args.temperature,
                   "alpha_kl": args.alpha_kl,
                   "beta_feature": args.beta_feature,
                   "seeds": sorted(int(s) for s in per_seed)},
        "per_seed": per_seed,
        "mean_miou": {a: round(mean[a], 4) for a in arms},
        "seed_spread": {a: round(spread[a], 4) for a in arms},
        "kd_gap_per_seed": {s: round(g, 4) for s, g in gaps.items()},
        "kd_gap_mean": round(sum(gaps.values()) / len(gaps), 4),
        "kd_gap_min": round(min(gaps.values()), 4),
        "kd_lift_every_seed": bool(min(gaps.values()) > 0),
    }

    print("\n=== Cross-architecture KD (spatial teacher -> PP student) ===")
    print(f"{'arm':>16s} {'mean mIoU':>10s} {'spread':>8s}   per-seed")
    for a in arms:
        vals = " ".join(f"{per_seed[s][a]:.4f}" for s in sorted(per_seed))
        print(f"{a:>16s} {mean[a]:10.4f} {spread[a]:8.4f}   {vals}")
    print("paired KD gap per seed: "
          + " ".join(f"{gaps[s]:+.4f}" for s in sorted(gaps)))
    print(f"KD gap: mean {results['kd_gap_mean']:+.4f}, "
          f"min {results['kd_gap_min']:+.4f} "
          f"({'POSITIVE on every seed' if results['kd_lift_every_seed'] else 'NOT consistently positive'})")
    return results


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--teacher-width", type=float, default=2.0)
    p.add_argument("--teacher-epochs", type=int, default=None)
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--alpha-kl", type=float, default=0.5)
    p.add_argument("--beta-feature", type=float, default=0.5)
    p.add_argument("--output", default="kd_crossarch_results.json")
    args = p.parse_args(argv)

    per_seed = {}
    for seed in args.seeds:
        per_seed[str(seed)] = run_seed(seed, args)

    results = summarize(per_seed, args)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"Wrote {args.output}")
    return results


if __name__ == "__main__":
    main()
