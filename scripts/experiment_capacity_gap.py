#!/usr/bin/env python
"""Teacher-student capacity gap: does a bigger teacher hurt a SMALL student?

Teacher-width scaling (teacher_scaling_results.json) showed the full-size
minimal/128 student tracks teacher capacity monotonically (teacher w=1/2/4
-> student 0.9234/0.9423/0.9466, seed 0). The classic capacity-gap result
(Mirzadeh et al.'s teacher-assistant setup) predicts the opposite once the
student is much smaller than the teacher: past some gap, a bigger teacher
teaches WORSE. This grid measures that question on our benchmark: the
half-width minimal student (teacher_config scaling, ~4x fewer params than
the w=2 teacher per width step) distilled with the best recipe from
teachers of width 1 / 2 / 4 — same seed, regime, and executables, so the
three cells are internally paired and directly comparable to the
full-size-student rows in teacher_scaling_results.json.

Per teacher width: train the augment-trained minimal teacher (seed 0 —
bit-reproducing the committed tscale/best_overall teachers, recorded in
the artifact), then distill into the half-width student via the public
train_distill.py CLI (--width 0.5 --teacher-width W). Writes
capacity_gap_results.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform
from scripts import train_distill
from scripts.experiment_teacher_scaling import REGIME, _cache_gb

# Committed seed-0 teacher histories for the same (width, seed, regime):
# retraining is deterministic, so the fresh teacher should reproduce these.
COMMITTED_TEACHERS = {
    1.0: "checkpoints/tscale_w1.0_s0_teacher/training_history.json",
    2.0: "checkpoints/best_overall_minimal_s0_teacher/training_history.json",
    4.0: "checkpoints/tscale_w4.0_s0_teacher/training_history.json",
}


def _teacher_best(run_dir: str) -> float:
    with open(f"{run_dir}/training_history.json") as f:
        return max(json.load(f)["val_miou"])


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--teacher-widths", type=float, nargs="+",
                   default=[1.0, 2.0, 4.0])
    p.add_argument("--student-width", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default="capacity_gap_results.json")
    args = p.parse_args(argv)

    try:
        with open(args.output) as f:
            per_tw = json.load(f)["per_teacher_width"]
    except FileNotFoundError:
        per_tw = {}

    for tw in args.teacher_widths:
        if str(tw) in per_tw:
            print(f"teacher width {tw}: already measured, skipping")
            continue
        save = f"checkpoints/capgap_tw{tw}_s{args.seed}"
        run_args = REGIME + [
            "--seed", str(args.seed), "--save-dir", save,
            "--width", str(args.student_width),
            "--teacher-width", str(tw),
            "--cache-hbm-gb", _cache_gb(tw)]
        if tw >= 3.0:
            # fp32 cache at w=4 is ~10.1 GB (> one v5e HBM next to the
            # step); bf16 halves it — same choice as teacher_scaling.
            run_args += ["--cache-dtype", "bfloat16"]
        tck = f"{save}_teacher/best.ckpt"
        if os.path.exists(tck):
            print(f"\n=== teacher w={tw}: distill from existing ckpt ===",
                  flush=True)
            run_args += ["--teacher-checkpoint", tck]
        else:
            print(f"\n=== teacher w={tw}: teacher + distill ===", flush=True)
            run_args += ["--train-teacher"]
        best = float(train_distill.main(run_args))
        teacher_best = _teacher_best(f"{save}_teacher")
        row = {"teacher": teacher_best, "student": best}
        committed = COMMITTED_TEACHERS.get(tw)
        if committed and os.path.exists(committed):
            with open(committed) as f:
                committed_best = max(json.load(f)["val_miou"])
            row["teacher_reproduces_committed"] = (
                abs(committed_best - teacher_best) < 1e-12)
            row["committed_teacher"] = committed_best
        if tw >= 3.0:
            row["cache_dtype"] = "bfloat16"
        per_tw[str(tw)] = row
        with open(args.output, "w") as f:
            json.dump(_payload(per_tw, args), f, indent=2)
        print(f"teacher w={tw}: teacher {teacher_best:.4f} "
              f"student(w={args.student_width:g}) {best:.4f}")

    print(f"\n=== capacity gap (minimal family, student "
          f"w={args.student_width:g}, best recipe, seed {args.seed}) ===")
    for tw, r in sorted(per_tw.items(), key=lambda t: float(t[0])):
        print(f"teacher w={tw}: teacher {r['teacher']:.4f} "
              f"student {r['student']:.4f}")
    return _payload(per_tw, args)


def _payload(per_tw, args):
    return {"benchmark": "synthetic_hard",
            "config": {"regime": "kd_lift (400/512, 40ep)",
                       "student": f"minimal, width {args.student_width:g} "
                                  "(teacher_config scaling)",
                       "teacher": "minimal, width-multiplied, "
                                  "photometric-augment-trained",
                       "recipe": "noisy-student KD, T=4, cached clean "
                                 "teacher targets",
                       "seed": args.seed},
            "full_size_student_rows": "teacher_scaling_results.json",
            "per_teacher_width": per_tw}


if __name__ == "__main__":
    main()
