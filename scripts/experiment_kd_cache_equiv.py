#!/usr/bin/env python
"""Accuracy-level validation of the cached-teacher KD path.

BASELINE.md benches the cached-teacher step as the headline because the
cache is exact for this pipeline (deterministic per-sample downsampling,
no augmentation). This experiment validates that claim at the ACCURACY
level, not just the per-step-equivalence level (tests/test_kd.py).

ROUND-4 CORRECTION: the round-3 version of this experiment compared
against the committed in-loop number while running with the KD-lift
config's `onchip_epoch=True` — and before round 4 the on-chip epoch loop
was hard-wired to the IN-LOOP teacher step regardless of
KDConfig.cache_teacher, so its "cached" arm silently trained in-loop and
the recorded |diff| = 0 was vacuous. Round 4 made cache_teacher actually
ride the on-chip epoch (trainer._onchip_extra_args); this rerun is the
genuine comparison. It is also self-contained: it trains the teacher
(same config/seed as scripts/experiment_kd_lift.py — teacher training is
bit-reproducible, demonstrated across rounds), then the in-loop student
arm, then the cached student arm, all in one process.

Usage:
  python scripts/experiment_kd_cache_equiv.py [--seed 0]
      [--teacher-checkpoint <ckpt>]   # skip teacher training
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")

from scripts.common import add_common_args, build_loaders, apply_env_platform
from scripts.experiment_kd_lift import _base_config

from lmsu_tpu.config import KDConfig, teacher_config
from lmsu_tpu.training import DistillationTrainer, Trainer


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--teacher-checkpoint", default=None)
    p.add_argument("--output", default="kd_cache_equiv.json")
    args = p.parse_args(argv)
    seed = args.seed if args.seed is not None else 0

    base = _base_config(args)

    tck = args.teacher_checkpoint
    if tck is None or not os.path.exists(tck):
        # Teacher arm, exactly as experiment_kd_lift.run_seed trains it.
        tcfg = base.replace(
            model=teacher_config(base.model, 2.0),
            train=dataclasses.replace(
                base.train, seed=seed,
                save_dir=f"checkpoints/kd_lift_teacher_s{seed}"))
        tl, vl = build_loaders(tcfg)
        ttr = Trainer(tcfg, tl, vl)
        t_best = ttr.train()
        print(f"teacher (seed {seed}): best val mIoU {t_best:.6f}")
        tck = os.path.join(tcfg.train.save_dir, "latest.ckpt")

    results = {}
    times = {}
    for arm, cached in (("inloop", False), ("cached", True)):
        kd = KDConfig(enabled=True, temperature=2.0, alpha_kl=0.5,
                      beta_feature=0.5, teacher_width_mult=2.0,
                      teacher_checkpoint=tck, cache_teacher=cached,
                      # 2x-teacher fp32 taps = 5.05 GB for 400 samples;
                      # keep the cache HBM-resident (the on-chip epoch
                      # rejects the host-spilled cache by design).
                      cache_hbm_limit_bytes=6 << 30)
        cfg = base.replace(train=dataclasses.replace(
            base.train, seed=seed, kd=kd,
            save_dir=f"checkpoints/kd_lift_student_kd{arm}_s{seed}"))
        train_loader, val_loader = build_loaders(cfg)
        trainer = DistillationTrainer(cfg, train_loader, val_loader)
        t0 = time.perf_counter()
        results[arm] = float(trainer.train())
        times[arm] = round(time.perf_counter() - t0, 1)
        if cached:
            assert trainer.teacher_cache is not None, (
                "cached arm did not build the HBM teacher cache — the "
                "comparison would be vacuous (the round-3 failure mode)")
        print(f"student_kd[{arm}]: best val mIoU {results[arm]:.6f} "
              f"({times[arm]}s)")

    out = {"seed": seed,
           "onchip_epoch": bool(base.train.onchip_epoch),
           "student_kd_inloop": results["inloop"],
           "student_kd_cached": results["cached"],
           "abs_diff": abs(results["cached"] - results["inloop"]),
           "train_wall_s": times,
           "note": ("round-4 rerun: the cached arm genuinely rides the "
                    "on-chip epoch scan with the HBM teacher cache "
                    "(trainer asserts the cache exists); the round-3 "
                    "artifact's |diff|=0 was vacuous — see docstring")}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nin-loop {results['inloop']:.6f}  cached "
          f"{results['cached']:.6f}  |diff| {out['abs_diff']:.2e}")
    return out


if __name__ == "__main__":
    main()
