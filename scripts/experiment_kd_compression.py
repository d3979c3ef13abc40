#!/usr/bin/env python
"""KD compression sweep: how small can the student go?

The reference's north star is a LIGHTWEIGHT model trained via
distillation; this experiment measures the accuracy/size frontier by
shrinking the whole student (teacher_config width_mult < 1 scales every
stage) and distilling each size from the SAME trained 2x teacher
(teacher/student param ratios up to ~47x). Learned per-tap projections
(training/distill.py) absorb the channel mismatch, so any pairing works.

Per width w in --widths: train student-alone and student+KD (cached
teacher, seed-paired with the KD-lift runs). Reference points at w=1.0
come from kd_comparison_results.json.

Writes kd_compression_results.json.
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")

from scripts.common import add_common_args, build_loaders, apply_env_platform
from scripts.experiment_kd_lift import _base_config

from lmsu_tpu.config import KDConfig, teacher_config
from lmsu_tpu.models import create_model, init_model, count_parameters
from lmsu_tpu.training import DistillationTrainer, Trainer


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--widths", type=float, nargs="+", default=[0.5, 0.25])
    p.add_argument("--teacher-checkpoint", default=None)
    p.add_argument("--output", default="kd_compression_results.json")
    args = p.parse_args(argv)
    seed = args.seed if args.seed is not None else 0
    tck = args.teacher_checkpoint or \
        f"checkpoints/kd_lift_teacher_s{seed}/latest.ckpt"

    base = _base_config(args)
    teacher_cfg = teacher_config(base.model, 2.0)  # the trained 2x teacher

    results = {}
    for w in args.widths:
        tag = f"w{w:g}"
        student_model = teacher_config(base.model, w) if w != 1.0 \
            else base.model
        import jax
        n_params = count_parameters(init_model(
            create_model(student_model), jax.random.PRNGKey(0),
            image_size=(64, 64), num_points=128)["params"])
        row = {"params": n_params}

        scfg = base.replace(
            model=student_model,
            train=dataclasses.replace(
                base.train, seed=seed,
                save_dir=f"checkpoints/kd_compress_{tag}_s{seed}"))
        print(f"\n=== width {w}: student alone ({n_params:,} params) ===",
              flush=True)
        tl, vl = build_loaders(scfg)
        row["student"] = float(Trainer(scfg, tl, vl).train())

        kd = KDConfig(enabled=True, temperature=2.0, alpha_kl=0.5,
                      beta_feature=0.5, teacher_checkpoint=tck,
                      cache_teacher=True)
        kcfg = base.replace(
            model=student_model,
            train=dataclasses.replace(
                base.train, seed=seed, kd=kd,
                save_dir=f"checkpoints/kd_compress_{tag}_kd_s{seed}"))
        print(f"\n=== width {w}: student + KD ===", flush=True)
        tl, vl = build_loaders(kcfg)
        row["student_kd"] = float(DistillationTrainer(
            kcfg, tl, vl, teacher_model_config=teacher_cfg).train())
        row["kd_gap"] = round(row["student_kd"] - row["student"], 4)
        results[tag] = row

    ref = json.load(open("kd_comparison_results.json"))["per_seed"][str(seed)]
    out = {"benchmark": "synthetic_hard", "seed": seed,
           "teacher": {"params": 2026052, "miou": ref["teacher"]},
           "w1_reference": {"params": 528132, "student": ref["student"],
                            "student_kd": ref["student_kd"]},
           "sweep": results}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\n=== KD compression (seed {seed}) ===")
    print(f"{'width':>6s} {'params':>10s} {'student':>8s} "
          f"{'+KD':>8s} {'gap':>7s}")
    print(f"{'1.0':>6s} {528132:>10,d} {ref['student']:8.4f} "
          f"{ref['student_kd']:8.4f} {ref['student_kd']-ref['student']:+7.4f}")
    for tag, r in results.items():
        print(f"{tag[1:]:>6s} {r['params']:>10,d} {r['student']:8.4f} "
              f"{r['student_kd']:8.4f} {r['kd_gap']:+7.4f}")
    return out


if __name__ == "__main__":
    main()
