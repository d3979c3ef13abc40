#!/usr/bin/env python
"""Best recipe x cross-architecture KD: can the measured-best recipe
(noisy-student KD, T=4, cached clean-input teacher targets) lift a
student whose LiDAR encoder DIFFERS from the teacher's?

kd_crossarch_results.json established that plain in-loop KD (T=2)
transfers from a 2x spatial-encoder teacher into a PointPillars student
(+1.0/+2.2/+2.1 pt paired). best_overall_results.json established the
best recipe on a same-architecture pair. This experiment composes the
two on the same regime/seeds:

  teacher: 2x-wide SPATIAL-encoder model, trained WITH photometric
           augmentation (as in best_overall);
  student: standard-width POINTPILLARS model, distilled noisy-student
           style — teacher targets cached from CLEAN inputs, photometric
           + point-dropout augmentation on the student, temperature 4.

Paired baselines come from kd_crossarch_results.json (same seeds, same
regime, same student config): `pp_student` (plain) and `pp_student_kd`
(in-loop T=2, clean teacher). Writes kd_crossarch_best.json.

Drives the public train_distill.py CLI end to end.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform
from scripts import train_distill

REGIME = ["--dataset", "synthetic", "--difficulty", "hard",
          "--num-train", "400", "--num-val", "512", "--epochs", "40",
          "--batch-size", "32",
          "--lidar-encoder", "pointpillars",
          "--teacher-lidar-encoder", "spatial",
          "--cache-teacher", "--cache-hbm-gb", "6", "--temperature", "4",
          "--augment", "--aug-hflip", "0", "--scan-steps", "13"]


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--output", default="kd_crossarch_best.json")
    p.add_argument("--baseline", default="kd_crossarch_results.json")
    args = p.parse_args(argv)

    try:
        with open(args.output) as f:
            per_seed = json.load(f)["per_seed"]
    except FileNotFoundError:
        per_seed = {}

    for seed in args.seeds:
        save = f"checkpoints/crossarch_best_s{seed}"
        tck = f"{save}_teacher/best.ckpt"
        seed_args = REGIME + ["--seed", str(seed), "--save-dir", save]
        if os.path.exists(tck):
            # Teacher already trained (e.g. rerun after a relay outage).
            print(f"\n=== seed {seed}: reusing teacher {tck} ===", flush=True)
            seed_args += ["--teacher-checkpoint", tck]
        else:
            print(f"\n=== seed {seed}: teacher + distill ===", flush=True)
            seed_args += ["--train-teacher"]
        best = float(train_distill.main(seed_args))
        per_seed[str(seed)] = {
            "teacher_spatial_aug": _teacher_best(f"{save}_teacher"),
            "pp_student_best_recipe": best}
        with open(args.output, "w") as f:
            json.dump(_payload(per_seed, args), f, indent=2)
        print(f"seed {seed}: teacher "
              f"{per_seed[str(seed)]['teacher_spatial_aug']:.4f} "
              f"student {best:.4f}")

    results = _payload(per_seed, args)
    print("\n=== best recipe x cross-arch (spatial teacher -> PP student) ===")
    for s, r in sorted(results["per_seed"].items()):
        line = (f"seed {s}: teacher {r['teacher_spatial_aug']:.4f}  "
                f"recipe {r['pp_student_best_recipe']:.4f}")
        if "vs_plain" in r:
            line += (f"  (vs plain {r['vs_plain']:+.4f}, "
                     f"vs in-loop T=2 KD {r['vs_kd_t2']:+.4f})")
        print(line)
    if "recipe_gap_mean" in results:
        print(f"paired gap vs plain student: mean "
              f"{results['recipe_gap_mean']:+.4f}, "
              f"min {results['recipe_gap_min']:+.4f}")
    return results


def _teacher_best(run_dir: str) -> float:
    with open(f"{run_dir}/training_history.json") as f:
        return max(json.load(f)["val_miou"])


def _payload(per_seed, args):
    out = {"benchmark": "synthetic_hard",
           "experiment": "best_recipe_cross_architecture",
           "config": {"regime": "kd_lift (400/512, 40ep)",
                      "student": "weighted/128 PointPillars",
                      "teacher": "2x weighted spatial, "
                                 "photometric-augment-trained",
                      "recipe": "noisy-student KD, T=4, cached clean "
                                "teacher targets",
                      "paired_baselines": args.baseline,
                      "seeds": sorted(int(s) for s in per_seed)},
           "per_seed": dict(per_seed)}
    # Paired gaps against the committed cross-arch arms (same seeds/regime).
    try:
        with open(args.baseline) as f:
            base = json.load(f)["per_seed"]
    except FileNotFoundError:
        base = {}
    gaps = []
    for s, r in out["per_seed"].items():
        if s in base:
            r["vs_plain"] = round(
                r["pp_student_best_recipe"] - base[s]["pp_student"], 4)
            r["vs_kd_t2"] = round(
                r["pp_student_best_recipe"] - base[s]["pp_student_kd"], 4)
            gaps.append(r["vs_plain"])
    if gaps:
        out["recipe_gap_mean"] = round(sum(gaps) / len(gaps), 4)
        out["recipe_gap_min"] = round(min(gaps), 4)
        out["recipe_lift_every_seed"] = bool(min(gaps) > 0)
    vals = [r["pp_student_best_recipe"] for r in per_seed.values()]
    out["mean_student"] = round(sum(vals) / len(vals), 4)
    return out


if __name__ == "__main__":
    main()
