#!/usr/bin/env python
"""Best-recipe composition: noisy-student KD at the sweep-best T=4.

The two strongest measured levers have never been composed:

- noisy-student KD (experiment_augment_noisy.py): cached CLEAN-input
  teacher targets + photometric/point-dropout student augmentation —
  best arm in augment_results.json (mean +4.2 pt over the plain
  student, beats its own teacher on 3/3 seeds) at the default T=2.
- T=4 distillation (experiment_kd_sweep.py): +1.4/+0.8/+0.2 pt paired
  over T=2 on every seed tested, without augmentation.

This script runs the composed arm — cached clean teacher, NOISY_AUGMENT
student, temperature 4 — on the same seeds/regime as every committed
arm (same teacher checkpoints from experiment_augment.py), appending
`student_kd_noisy_t4` into augment_results.json so all gaps stay paired.

With --width w != 1 the STUDENT shrinks (teacher_config scaling, as in
experiment_kd_compression.py) while the teacher stays the trained 2x
model — the maximally-compressed best recipe; the arm key gains a
`_w{w}` suffix and is comparable against kd_compression_results.json's
same-seed w rows.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, ".")

from scripts.common import (add_common_args, apply_env_platform,
                            build_loaders)
from scripts.experiment_augment import _base_config
from scripts.experiment_augment_noisy import NOISY_AUGMENT

from lmsu_tpu.config import AugmentConfig, KDConfig, teacher_config
from lmsu_tpu.training import DistillationTrainer

ARM = "student_kd_noisy_t4"


def arm_key(args) -> str:
    return ARM if args.width == 1.0 else f"{ARM}_w{args.width:g}"


def run_seed(seed: int, args) -> float:
    base = _base_config(args)
    teacher_ckpt = f"checkpoints/augment_teacher_s{seed}/best.ckpt"
    if not os.path.exists(teacher_ckpt):
        raise FileNotFoundError(
            f"{teacher_ckpt} missing — run scripts/experiment_augment.py "
            f"--seeds {seed} first (it trains and saves the seed's teacher)")
    kd = KDConfig(enabled=True, teacher_width_mult=args.teacher_width,
                  temperature=args.temperature,
                  cache_teacher=True, teacher_checkpoint=teacher_ckpt,
                  # 2x teacher fp32 taps @ 400 samples = 5.05 GB; keep the
                  # cache HBM-resident (spilling costs 242 s/epoch over the
                  # relay — see ROADMAP operational note).
                  cache_hbm_limit_bytes=6 << 30)
    student_model = base.model if args.width == 1.0 \
        else teacher_config(base.model, args.width)
    tag = "" if args.width == 1.0 else f"_w{args.width:g}"
    cfg = base.replace(
        model=student_model,
        train=dataclasses.replace(
            base.train, seed=seed, kd=kd,
            augment=AugmentConfig(**NOISY_AUGMENT),
            onchip_epoch=False, scan_steps=13,
            save_dir=f"checkpoints/best_recipe{tag}_s{seed}"))
    print(f"\n=== seed {seed}: noisy-student KD, T={args.temperature}, "
          f"width {args.width:g} ===", flush=True)
    train_loader, val_loader = build_loaders(cfg)
    trainer = DistillationTrainer(
        cfg, train_loader, val_loader,
        teacher_model_config=teacher_config(base.model, args.teacher_width))
    return trainer.train()


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--teacher-width", type=float, default=2.0)
    p.add_argument("--temperature", type=float, default=4.0)
    p.add_argument("--width", type=float, default=1.0,
                   help="student width multiplier (1.0 = reference size)")
    p.add_argument("--output", default="augment_results.json")
    args = p.parse_args(argv)
    key = arm_key(args)

    with open(args.output) as f:
        results = json.load(f)

    for seed in args.seeds:
        best = run_seed(seed, args)
        results["per_seed"][str(seed)][key] = best
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
        print(f"seed {seed}: {key} {best:.4f}")

    rows = {s: r for s, r in results["per_seed"].items() if key in r}
    vs_teacher = {s: r[key] - r["teacher"] for s, r in rows.items()}
    results["config"]["best_recipe_temperature"] = args.temperature
    print(f"\n=== best recipe (noisy-student KD, T={args.temperature}, "
          f"width {args.width:g}) ===")
    if args.width == 1.0:
        vs_t2 = {s: r[key] - r["student_kd_noisy"] for s, r in rows.items()}
        results["best_recipe_vs_noisy_t2"] = {s: round(g, 4)
                                              for s, g in vs_t2.items()}
        results["best_recipe_vs_noisy_t2_mean"] = round(
            sum(vs_t2.values()) / len(vs_t2), 4)
        for s in sorted(rows):
            r = rows[s]
            print(f"seed {s}: teacher {r['teacher']:.4f}  noisy(T=2) "
                  f"{r['student_kd_noisy']:.4f}  noisy(T=4) {r[key]:.4f}  "
                  f"(vs T=2 {vs_t2[s]:+.4f}, vs teacher "
                  f"{vs_teacher[s]:+.4f})")
        print("vs noisy T=2: mean "
              f"{results['best_recipe_vs_noisy_t2_mean']:+.4f}")
    else:
        for s in sorted(rows):
            print(f"seed {s}: teacher {rows[s]['teacher']:.4f}  {key} "
                  f"{rows[s][key]:.4f} (vs teacher {vs_teacher[s]:+.4f})")
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
