#!/usr/bin/env python
"""Best-overall-model run: the best recipe applied to the best family.

kd_variants_results.json showed the MINIMAL-fusion student (494,978
params) is the strongest small model under plain cached KD (0.9270,
seed 0). This experiment applies the full best recipe to it per seed:

  1. train a 2x-wide minimal teacher WITH photometric augmentation
     (the augment flag covers both phases of train_distill.py — an
     augment-trained teacher is itself stronger);
  2. distill noisy-student style at T=4: teacher targets cached from
     CLEAN inputs (cache fill bypasses the in-step augmentation),
     photometric/dropout augmentation on the student, cache pinned in
     HBM (--cache-hbm-gb 6; the 2x minimal teacher's fp32 taps for 400
     samples are 5.05 GB and spilling costs ~242 s/epoch on this host).

Arms are NOT paired with kd_variants_results.json (different teacher:
augment-trained vs clean) — the claim is absolute: best val mIoU of any
student trained in this project. Writes best_overall_results.json.

Drives the public train_distill.py CLI end to end (the probe IS the
interface).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform
from scripts import train_distill

REGIME = ["--dataset", "synthetic", "--difficulty", "hard",
          "--num-train", "400", "--num-val", "512", "--epochs", "40",
          "--batch-size", "32", "--fusion-type", "minimal",
          "--fusion-channels", "128", "--cache-teacher",
          "--cache-hbm-gb", "6", "--temperature", "4",
          "--augment", "--aug-hflip", "0", "--scan-steps", "13"]


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--output", default="best_overall_results.json")
    args = p.parse_args(argv)

    try:
        with open(args.output) as f:
            per_seed = json.load(f)["per_seed"]
    except FileNotFoundError:
        per_seed = {}

    for seed in args.seeds:
        save = f"checkpoints/best_overall_minimal_s{seed}"
        import os
        tck = f"{save}_teacher/best.ckpt"
        seed_args = REGIME + ["--seed", str(seed), "--save-dir", save]
        if os.path.exists(tck):
            # Teacher already trained (e.g. resuming after a relay
            # outage) — distill-only.
            print(f"\n=== seed {seed}: reusing teacher {tck} ===",
                  flush=True)
            seed_args += ["--teacher-checkpoint", tck]
        else:
            print(f"\n=== seed {seed}: teacher + distill ===", flush=True)
            seed_args += ["--train-teacher"]
        best = float(train_distill.main(seed_args))
        teacher_best = _teacher_best(f"{save}_teacher")
        per_seed[str(seed)] = {"teacher": teacher_best,
                               "student_best_recipe": best}
        with open(args.output, "w") as f:
            json.dump(_payload(per_seed), f, indent=2)
        print(f"seed {seed}: teacher {teacher_best:.4f} student {best:.4f}")

    results = _payload(per_seed)
    print("\n=== best overall model (minimal/128 student, best recipe) ===")
    for s, r in sorted(per_seed.items()):
        print(f"seed {s}: teacher {r['teacher']:.4f}  student "
              f"{r['student_best_recipe']:.4f}")
    print(f"mean student {results['mean_student']:.4f}")
    return results


def _teacher_best(run_dir: str) -> float:
    with open(f"{run_dir}/training_history.json") as f:
        return max(json.load(f)["val_miou"])


def _payload(per_seed):
    vals = [r["student_best_recipe"] for r in per_seed.values()]
    return {"benchmark": "synthetic_hard",
            "config": {"regime": "kd_lift (400/512, 40ep)",
                       "student": "minimal/128 (494,978 params)",
                       "teacher": "2x minimal, photometric-augment-trained",
                       "recipe": "noisy-student KD, T=4, cached clean "
                                 "teacher targets",
                       "seeds": sorted(int(s) for s in per_seed)},
            "per_seed": per_seed,
            "mean_student": round(sum(vals) / len(vals), 4)}


if __name__ == "__main__":
    main()
