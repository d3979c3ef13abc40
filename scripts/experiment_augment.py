#!/usr/bin/env python
"""Augmentation-lift experiment on the hard synthetic benchmark, seeded.

Measures what the device-side augmentation subsystem (ops/augment.py) buys
at the accuracy level, and whether it compounds with KD, in the exact
low-data regime of the KD-lift experiment (experiment_kd_lift.py: weighted
/128 student, 400 train / 512 val, 40 epochs, onchip_epoch) so results are
PAIRED with the committed kd_comparison_results.json arms per seed.

Arms per seed (all share the seed's data order / init streams):
  1. teacher      — 2x-wide, labels only (re-trained; checkpoints are not
                    committed). Reproduces kd_comparison_results.json's
                    teacher number for the seed — a determinism anchor.
  2. student+aug  — standard model + the standard augmentation recipe
                    (scripts/common.py::STANDARD_AUGMENT: hflip 0.5,
                    brightness/contrast 0.1, noise 0.02, point dropout .05).
  3. student+KD+aug — distilled from THIS seed's teacher with the in-loop
                    teacher (hflip forbids the teacher cache — the teacher
                    sees the augmented batch), same augmentation.

Plain student / student+KD baselines are reused from
kd_comparison_results.json when its config matches (they are deterministic
reruns of the same executables — the cross-arch experiment demonstrated
bit-exact reproduction); --rerun-baselines retrains them here instead.

Writes augment_results.json with paired per-seed gaps:
  aug_gap        = student_aug    - student      (augmentation alone)
  kd_aug_gap     = student_kd_aug - student      (combined recipe)
  aug_on_top_of_kd = student_kd_aug - student_kd (does aug compound KD?)
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, ".")

from scripts.common import (STANDARD_AUGMENT, add_common_args,
                            apply_env_platform, apply_overrides,
                            build_loaders)

from lmsu_tpu.config import (AugmentConfig, DataConfig, ExperimentConfig,
                             KDConfig, ModelConfig, TrainConfig,
                             teacher_config)
from lmsu_tpu.training import DistillationTrainer, Trainer


def _base_config(args) -> ExperimentConfig:
    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=2, fusion_type="weighted",
                          fusion_out_channels=128),
        data=DataConfig(dataset="synthetic", synthetic_difficulty="hard",
                        synthetic_num_train=400, synthetic_num_val=512,
                        batch_size=32),
        train=TrainConfig(num_epochs=40, class_weights=(0.4, 3.5),
                          onchip_epoch=True,
                          save_dir="checkpoints/augment"))
    return apply_overrides(cfg, args)


def _train(cfg, trainer_cls, **kw):
    train_loader, val_loader = build_loaders(cfg)
    trainer = trainer_cls(cfg, train_loader, val_loader, **kw)
    return trainer.train(), trainer


def _load_baselines(args):
    """Per-seed student / student_kd from kd_comparison_results.json when
    its config matches this run's regime; None forces a rerun."""
    if args.rerun_baselines or not os.path.exists(args.baselines):
        return None
    with open(args.baselines) as f:
        prior = json.load(f)
    base = _base_config(args)
    want = {"num_train": base.data.synthetic_num_train,
            "num_val": base.data.synthetic_num_val,
            "epochs": base.train.num_epochs,
            "batch_size": base.data.batch_size}
    got = {k: prior.get("config", {}).get(k) for k in want}
    if got != want or prior.get("benchmark") != "synthetic_hard":
        print(f"baselines config mismatch ({got} != {want}); re-running")
        return None
    return prior["per_seed"]


def run_seed(seed: int, args, baselines) -> dict:
    base = _base_config(args)
    aug = AugmentConfig(**STANDARD_AUGMENT)
    out = {}

    # -- 1. teacher (plain) -------------------------------------------------
    tcfg = base.replace(
        model=teacher_config(base.model, args.teacher_width),
        train=dataclasses.replace(
            base.train, seed=seed,
            save_dir=f"checkpoints/augment_teacher_s{seed}"))
    print(f"\n=== seed {seed}: teacher ===", flush=True)
    out["teacher"], t_trainer = _train(tcfg, Trainer)

    import jax
    t_state = jax.device_get(t_trainer.state)
    teacher_vars = {"params": t_state.params,
                    "batch_stats": t_state.batch_stats}
    del t_trainer

    # -- baselines (reused or re-run) ---------------------------------------
    if baselines is not None and str(seed) in baselines:
        out["student"] = baselines[str(seed)]["student"]
        out["student_kd"] = baselines[str(seed)]["student_kd"]
        out["baselines_reused"] = True
    else:
        scfg = base.replace(train=dataclasses.replace(
            base.train, seed=seed,
            save_dir=f"checkpoints/augment_student_s{seed}"))
        print(f"\n=== seed {seed}: student (plain) ===", flush=True)
        out["student"], tr = _train(scfg, Trainer)
        del tr
        kcfg = base.replace(train=dataclasses.replace(
            base.train, seed=seed,
            kd=KDConfig(enabled=True, teacher_width_mult=args.teacher_width),
            save_dir=f"checkpoints/augment_student_kd_s{seed}"))
        print(f"\n=== seed {seed}: student+KD (plain) ===", flush=True)
        out["student_kd"], tr = _train(kcfg, DistillationTrainer,
                                       teacher_variables=teacher_vars)
        del tr
        out["baselines_reused"] = False

    # -- 2. student + augmentation ------------------------------------------
    acfg = base.replace(train=dataclasses.replace(
        base.train, seed=seed, augment=aug,
        save_dir=f"checkpoints/augment_student_aug_s{seed}"))
    print(f"\n=== seed {seed}: student + augment ===", flush=True)
    out["student_aug"], tr = _train(acfg, Trainer)
    del tr

    # -- 3. student + KD + augmentation (in-loop teacher) --------------------
    kacfg = base.replace(train=dataclasses.replace(
        base.train, seed=seed, augment=aug,
        kd=KDConfig(enabled=True, teacher_width_mult=args.teacher_width),
        save_dir=f"checkpoints/augment_student_kd_aug_s{seed}"))
    print(f"\n=== seed {seed}: student + KD + augment ===", flush=True)
    out["student_kd_aug"], tr = _train(kacfg, DistillationTrainer,
                                       teacher_variables=teacher_vars)
    del tr

    print(f"\nseed {seed}: teacher {out['teacher']:.4f}  "
          f"student {out['student']:.4f}  aug {out['student_aug']:.4f}  "
          f"kd {out['student_kd']:.4f}  kd+aug {out['student_kd_aug']:.4f}",
          flush=True)
    return out


def summarize(per_seed: dict, args) -> dict:
    arms = ("teacher", "student", "student_aug", "student_kd",
            "student_kd_aug")
    mean = {a: sum(r[a] for r in per_seed.values()) / len(per_seed)
            for a in arms}
    gaps = {
        "aug_gap": {s: r["student_aug"] - r["student"]
                    for s, r in per_seed.items()},
        "kd_aug_gap": {s: r["student_kd_aug"] - r["student"]
                       for s, r in per_seed.items()},
        "aug_on_top_of_kd": {s: r["student_kd_aug"] - r["student_kd"]
                             for s, r in per_seed.items()},
    }
    results = {
        "benchmark": "synthetic_hard",
        "config": {"num_train": _base_config(args).data.synthetic_num_train,
                   "num_val": _base_config(args).data.synthetic_num_val,
                   "epochs": _base_config(args).train.num_epochs,
                   "batch_size": _base_config(args).data.batch_size,
                   "teacher_width": args.teacher_width,
                   "augment": dict(STANDARD_AUGMENT),
                   "seeds": sorted(int(s) for s in per_seed)},
        "per_seed": per_seed,
        "mean_miou": {a: round(mean[a], 4) for a in arms},
    }
    for name, g in gaps.items():
        results[name + "_per_seed"] = {s: round(v, 4) for s, v in g.items()}
        results[name + "_mean"] = round(sum(g.values()) / len(g), 4)
        results[name + "_min"] = round(min(g.values()), 4)

    print("\n=== augmentation lift (hard synthetic benchmark) ===")
    print(f"{'arm':>16s} {'mean mIoU':>10s}   per-seed")
    for a in arms:
        vals = " ".join(f"{per_seed[s][a]:.4f}" for s in sorted(per_seed))
        print(f"{a:>16s} {mean[a]:10.4f}   {vals}")
    for name, g in gaps.items():
        print(f"{name}: mean {results[name + '_mean']:+.4f}, "
              f"min {results[name + '_min']:+.4f}  per-seed "
              + " ".join(f"{g[s]:+.4f}" for s in sorted(g)))
    return results


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--teacher-width", type=float, default=2.0)
    p.add_argument("--baselines", default="kd_comparison_results.json")
    p.add_argument("--rerun-baselines", action="store_true",
                   help="retrain plain student / student+KD instead of "
                   "reusing kd_comparison_results.json")
    p.add_argument("--output", default="augment_results.json")
    args = p.parse_args(argv)

    baselines = _load_baselines(args)
    per_seed = {}
    for seed in args.seeds:
        per_seed[str(seed)] = run_seed(seed, args, baselines)
        # Incremental dump: a crash in a later seed keeps finished arms.
        with open(args.output + ".partial", "w") as f:
            json.dump(per_seed, f, indent=2)

    results = summarize(per_seed, args)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"Wrote {args.output}")
    return results


if __name__ == "__main__":
    main()
