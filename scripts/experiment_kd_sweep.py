#!/usr/bin/env python
"""KD hyperparameter sweep: temperature / loss-weight sensitivity.

Sweeps the distillation hyperparameters around the KD-lift defaults
(T=2, alpha_kl=0.5, beta_feature=0.5) on the hard synthetic benchmark,
one seed, all arms sharing the seed's data order/init and the SAME
trained teacher (the seed's KD-lift teacher checkpoint), so differences
are attributable to the KD loss configuration alone. Uses the
cached-teacher path — proven bit-identical to in-loop training
(kd_cache_equiv.json) — so each run pays no teacher forward.

Reference points (kd_comparison_results.json, seed 0): student alone
0.8756, student+KD(T=2,0.5,0.5) 0.9004, teacher 0.9041.

Writes kd_sweep_results.json.
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

# (name, temperature, alpha_kl, beta_feature)
GRID = (
    ("T1_a.5_b.5", 1.0, 0.5, 0.5),
    ("T4_a.5_b.5", 4.0, 0.5, 0.5),
    ("T2_a.25_b.5", 2.0, 0.25, 0.5),
    ("T2_a.75_b.5", 2.0, 0.75, 0.5),
    ("T2_a.5_b0_logit_only", 2.0, 0.5, 0.0),
    ("T2_a0_b.5_feature_only", 2.0, 0.0, 0.5),
)


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--teacher-checkpoint", default=None)
    p.add_argument("--output", default="kd_sweep_results.json")
    p.add_argument("--configs", nargs="+", default=None,
                   choices=[g[0] for g in GRID],
                   help="run only these GRID entries (e.g. to replicate "
                   "one config on another seed)")
    args = p.parse_args(argv)
    seed = args.seed if args.seed is not None else 0
    tck = args.teacher_checkpoint or \
        f"checkpoints/kd_lift_teacher_s{seed}/latest.ckpt"

    grid = [g for g in GRID if args.configs is None or g[0] in args.configs]
    results = {}
    for name, temp, a_kl, b_feat in grid:
        kd = KDConfig(enabled=True, temperature=temp, alpha_kl=a_kl,
                      beta_feature=b_feat, teacher_width_mult=2.0,
                      teacher_checkpoint=tck, cache_teacher=True)
        base = _base_config(args)
        cfg = base.replace(train=dataclasses.replace(
            base.train, seed=seed, kd=kd,
            save_dir=f"checkpoints/kd_sweep_{name}_s{seed}"))
        print(f"\n=== {name} (T={temp}, alpha_kl={a_kl}, "
              f"beta_feature={b_feat}) ===", flush=True)
        train_loader, val_loader = build_loaders(cfg)
        trainer = DistillationTrainer(cfg, train_loader, val_loader)
        results[name] = float(trainer.train())
        del trainer

    ref = json.load(open("kd_comparison_results.json"))["per_seed"][str(seed)]
    out = {"seed": seed, "benchmark": "synthetic_hard",
           "baselines": {"student_alone": ref["student"],
                         "student_kd_T2_a.5_b.5": ref["student_kd"],
                         "teacher": ref["teacher"]},
           "sweep": results}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print("\n=== KD sweep (seed {}, hard benchmark) ===".format(seed))
    for k, v in sorted(out["sweep"].items(), key=lambda kv: -kv[1]):
        print(f"{k:>26s}  {v:.4f}")
    print(f"{'(default) T2_a.5_b.5':>26s}  {ref['student_kd']:.4f}")
    print(f"{'student alone':>26s}  {ref['student']:.4f}")
    return out


if __name__ == "__main__":
    main()
