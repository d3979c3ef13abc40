#!/usr/bin/env python
"""Teacher-assistant chain: w=4 -> w=1 (TA) -> w=0.5 progressive KD.

The companion to experiment_capacity_gap.py. If the half-width student
learns less from the 4x teacher than from a closer one (the capacity-gap
effect), the classic fix (Mirzadeh et al.) is a two-hop chain through an
intermediate "teacher assistant". This measures that chain on our
benchmark, reusing the grid's trained w=4 teacher:

  stage A: distill the w=4 teacher into a FULL-size (w=1) TA with the
           best recipe — the same configuration as the committed
           tscale w=4 row (teacher_scaling_results.json: student 0.9466
           from best-epoch teacher weights), so stage A doubles as a
           reproduction check of that number;
  stage B: distill the TA into the w=0.5 student (teacher-width 1,
           teacher checkpoint = the TA's best.ckpt — KD-student
           checkpoints load as teachers via load_model_variables'
           {'model','proj'} handling).

Comparable cells (same seed/regime, capacity_gap_results.json):
direct w4 -> 0.5, direct w2 -> 0.5, direct w1 -> 0.5. Note the TA is
NOT the same as the grid's w=1 teacher: the TA is itself KD-trained
(stronger than the plain augment-trained w=1 teacher), so the chain
also answers "is a distilled same-size teacher a better teacher?".
Writes ta_chain_results.json. Drives the public train_distill.py CLI.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform
from scripts import train_distill
from scripts.experiment_teacher_scaling import REGIME, _cache_gb


def _run(save, extra):
    return float(train_distill.main(
        REGIME + ["--save-dir", save] + extra))


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--w4-teacher",
                   default="checkpoints/capgap_tw4.0_s{seed}_teacher/"
                           "best.ckpt",
                   help="trained w=4 teacher (from the capacity-gap grid)")
    p.add_argument("--output", default="ta_chain_results.json")
    args = p.parse_args(argv)

    w4 = args.w4_teacher.format(seed=args.seed)
    if not os.path.exists(w4):
        raise FileNotFoundError(
            f"{w4} missing — run scripts/experiment_capacity_gap.py first")

    try:
        with open(args.output) as f:
            results = json.load(f)["stages"]
    except FileNotFoundError:
        results = {}

    ta_save = f"checkpoints/ta_chain_ta_s{args.seed}"
    ta_ckpt = f"{ta_save}/best.ckpt"
    if "ta" not in results or not os.path.exists(ta_ckpt):
        print("\n=== stage A: w=4 teacher -> w=1 TA ===", flush=True)
        results["ta"] = _run(ta_save, [
            "--seed", str(args.seed), "--teacher-width", "4",
            "--teacher-checkpoint", w4,
            "--cache-dtype", "bfloat16", "--cache-hbm-gb", _cache_gb(4.0)])
        _write(args, results)
    print(f"TA (w=1, from w=4 teacher): {results['ta']:.4f}")

    if "student" not in results:
        print("\n=== stage B: TA -> w=0.5 student ===", flush=True)
        results["student"] = _run(
            f"checkpoints/ta_chain_student_s{args.seed}", [
                "--seed", str(args.seed), "--width", "0.5",
                "--teacher-width", "1", "--teacher-checkpoint", ta_ckpt,
                "--cache-hbm-gb", _cache_gb(1.0)])
        _write(args, results)
    print(f"chained w=0.5 student: {results['student']:.4f}")

    try:
        with open("capacity_gap_results.json") as f:
            grid = json.load(f)["per_teacher_width"]
        print("\n=== vs direct distillation (capacity_gap_results.json) ===")
        for tw, r in sorted(grid.items(), key=lambda t: float(t[0])):
            print(f"direct w{tw} -> 0.5: {r['student']:.4f}")
        print(f"chain  w4 -> 1 -> 0.5: {results['student']:.4f}")
    except FileNotFoundError:
        pass
    return _write(args, results)


def _write(args, results):
    payload = {
        "benchmark": "synthetic_hard",
        "config": {"regime": "kd_lift (400/512, 40ep)",
                   "recipe": "noisy-student KD, T=4, cached clean "
                             "teacher targets",
                   "chain": "w4 teacher -> w1 TA -> w0.5 student",
                   "seed": args.seed},
        "direct_cells": "capacity_gap_results.json",
        "tscale_w4_student_committed": 0.9466429269362179,
        "stages": results}
    with open(args.output, "w") as f:
        json.dump(payload, f, indent=2)
    return payload


if __name__ == "__main__":
    main()
