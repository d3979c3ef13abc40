#!/usr/bin/env python
"""Accuracy-level validation of the cached-teacher KD path.

BASELINE.md benches the cached-teacher step as the headline because the
cache is exact for this pipeline (deterministic per-sample downsampling,
no augmentation). This experiment validates that claim at the ACCURACY
level, not just the per-step-equivalence level (tests/test_kd.py): rerun
the KD-lift student+KD arm for one seed with KDConfig.cache_teacher=True,
using the committed run's teacher (its final-epoch weights — the arm
passed the post-train() TrainState, i.e. latest.ckpt), and compare best
val mIoU against kd_comparison_results.json's in-loop-teacher number.

Usage:
  python scripts/experiment_kd_cache_equiv.py [--seed 0]
      [--teacher-checkpoint checkpoints/kd_lift_teacher_s0/latest.ckpt]
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")

from scripts.common import add_common_args, build_loaders, apply_env_platform
from scripts.experiment_kd_lift import _base_config

from lmsu_tpu.config import KDConfig
from lmsu_tpu.training import DistillationTrainer


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--teacher-checkpoint", default=None)
    p.add_argument("--output", default="kd_cache_equiv.json")
    args = p.parse_args(argv)
    seed = args.seed if args.seed is not None else 0
    tck = args.teacher_checkpoint or \
        f"checkpoints/kd_lift_teacher_s{seed}/latest.ckpt"

    base = _base_config(args)
    kd = KDConfig(enabled=True, temperature=2.0, alpha_kl=0.5,
                  beta_feature=0.5, teacher_width_mult=2.0,
                  teacher_checkpoint=tck, cache_teacher=True)
    cfg = base.replace(train=dataclasses.replace(
        base.train, seed=seed, kd=kd,
        save_dir=f"checkpoints/kd_lift_student_kdcache_s{seed}"))
    train_loader, val_loader = build_loaders(cfg)
    trainer = DistillationTrainer(cfg, train_loader, val_loader)
    best = trainer.train()

    ref = json.load(open("kd_comparison_results.json"))
    inloop = ref["per_seed"][str(seed)]["student_kd"]
    out = {"seed": seed, "student_kd_inloop": inloop,
           "student_kd_cached": float(best),
           "abs_diff": abs(float(best) - inloop)}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nin-loop {inloop:.6f}  cached {best:.6f}  "
          f"|diff| {out['abs_diff']:.2e}")
    return out


if __name__ == "__main__":
    main()
