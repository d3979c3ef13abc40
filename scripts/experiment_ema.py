#!/usr/bin/env python
"""EMA-weight probe on the hard synthetic benchmark.

Measures what TrainConfig.ema_decay buys at the accuracy level in the
KD-lift regime (weighted/128 student, 400 train / 512 val, 40 epochs —
same seeds/config as kd_comparison_results.json and augment_results.json,
so gaps are paired against the committed student / student_aug arms).

Arms per seed (via the train_synthetic CLI — the probe IS the public
interface): student+EMA, and student+augment+EMA (EMA should help most
under augmentation noise). Writes ema_results.json.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform
from scripts import train_synthetic

REGIME = ["--fusion-type", "weighted", "--fusion-channels", "128",
          "--difficulty", "hard", "--num-train", "400", "--num-val", "512",
          "--epochs", "40", "--batch-size", "32", "--onchip-epoch"]


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--ema-decay", type=float, default=0.99)
    p.add_argument("--baselines", default="augment_results.json")
    p.add_argument("--output", default="ema_results.json")
    args = p.parse_args(argv)

    baselines = {}
    try:
        with open(args.baselines) as f:
            baselines = json.load(f)["per_seed"]
    except (FileNotFoundError, KeyError):
        pass

    per_seed = {}
    for seed in args.seeds:
        row = {}
        if str(seed) in baselines:
            row["student"] = baselines[str(seed)].get("student")
            row["student_aug"] = baselines[str(seed)].get("student_aug")
        print(f"\n=== seed {seed}: student + EMA({args.ema_decay}) ===",
              flush=True)
        row["student_ema"] = train_synthetic.main(
            REGIME + ["--seed", str(seed),
                      "--ema-decay", str(args.ema_decay),
                      "--save-dir", f"checkpoints/ema_student_s{seed}"])
        print(f"\n=== seed {seed}: student + augment + EMA ===", flush=True)
        row["student_aug_ema"] = train_synthetic.main(
            REGIME + ["--seed", str(seed), "--augment",
                      "--ema-decay", str(args.ema_decay),
                      "--save-dir", f"checkpoints/ema_student_aug_s{seed}"])
        per_seed[str(seed)] = row
        with open(args.output + ".partial", "w") as f:
            json.dump(per_seed, f, indent=2)

    results = {"benchmark": "synthetic_hard",
               "config": {"regime": "kd_lift (400/512, 40ep, weighted/128)",
                          "ema_decay": args.ema_decay,
                          "seeds": sorted(int(s) for s in per_seed)},
               "per_seed": per_seed}
    for s, r in sorted(per_seed.items()):
        msg = f"seed {s}: student+EMA {r['student_ema']:.4f}"
        if r.get("student") is not None:
            msg += f" (plain {r['student']:.4f}, " \
                   f"gap {r['student_ema'] - r['student']:+.4f})"
        msg += f"; aug+EMA {r['student_aug_ema']:.4f}"
        if r.get("student_aug") is not None:
            msg += f" (aug {r['student_aug']:.4f}, gap " \
                   f"{r['student_aug_ema'] - r['student_aug']:+.4f})"
        print(msg)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"Wrote {args.output}")
    return results


if __name__ == "__main__":
    main()
