#!/usr/bin/env python
"""Gated-sum fusion on the hard benchmark: does fixing the convexity
constraint close the weighted-fusion gap?

The trained-gate ablation (docs/weighted_gate_analysis.json, DESIGN.md
"Why weighted fusion trails") concluded the weighted variant is capped by
its softmax: a convex per-pixel combination can only interpolate the two
modalities while the task rewards superposition. GatedSumFusion
(models/fusion.py) replaces the softmax with independent sigmoids — same
parameter count (528,132 at /128), strictly larger function class
(contains both minimal's add and weighted's mask).

This experiment trains gated_sum/128 on the exact seeded-ablation regime
(kd_lift: 400/512, 40 epochs, B=32, onchip epochs, seeds 0-2 — seeding is
save-dir-independent, so runs pair with fusion_ablation_hard_seeded.json's
committed concat/minimal/weighted rows). Prediction from the analysis:
gated_sum ≥ weighted on every seed; parity with minimal would confirm the
convexity story completely.

Writes fusion_gated_sum_results.json.
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")

from scripts.common import (add_common_args, apply_env_platform,
                            apply_overrides, build_loaders)

from lmsu_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from lmsu_tpu.training import Trainer


def _base_config(args) -> ExperimentConfig:
    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=2, fusion_type="gated_sum",
                          fusion_out_channels=128),
        data=DataConfig(dataset="synthetic", synthetic_difficulty="hard",
                        synthetic_num_train=400, synthetic_num_val=512,
                        batch_size=32),
        train=TrainConfig(num_epochs=40, class_weights=(0.4, 3.5),
                          onchip_epoch=True,
                          save_dir="checkpoints/gated_sum"))
    return apply_overrides(cfg, args)


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--output", default="fusion_gated_sum_results.json")
    p.add_argument("--baseline", default="fusion_ablation_hard_seeded.json")
    args = p.parse_args(argv)

    try:
        with open(args.output) as f:
            per_seed = json.load(f)["per_seed"]
    except FileNotFoundError:
        per_seed = {}

    base = _base_config(args)
    for seed in args.seeds:
        cfg = base.replace(train=dataclasses.replace(
            base.train, seed=seed,
            save_dir=f"checkpoints/gated_sum_s{seed}"))
        print(f"\n=== seed {seed}: gated_sum/128 ===", flush=True)
        train_loader, val_loader = build_loaders(cfg)
        trainer = Trainer(cfg, train_loader, val_loader)
        best = float(trainer.train())
        del trainer
        per_seed[str(seed)] = {"gated_sum": best}
        with open(args.output, "w") as f:
            json.dump(_payload(per_seed, args), f, indent=2)
        print(f"seed {seed}: gated_sum {best:.4f}")

    results = _payload(per_seed, args)
    print("\n=== gated_sum vs the seeded hard ablation (paired) ===")
    for s, r in sorted(results["per_seed"].items()):
        line = f"seed {s}: gated_sum {r['gated_sum']:.4f}"
        if "vs_weighted" in r:
            line += (f"  (vs weighted {r['vs_weighted']:+.4f}, vs minimal "
                     f"{r['vs_minimal']:+.4f}, vs concat {r['vs_concat']:+.4f})")
        print(line)
    if "gap_vs_weighted_mean" in results:
        print(f"vs weighted: mean {results['gap_vs_weighted_mean']:+.4f}, "
              f"min {results['gap_vs_weighted_min']:+.4f}")
    return results


def _payload(per_seed, args):
    out = {"benchmark": "synthetic_hard",
           "experiment": "gated_sum_fusion",
           "config": {"regime": "kd_lift (400/512, 40ep, onchip)",
                      "model": "gated_sum/128 (528,132 params)",
                      "paired_baselines": args.baseline,
                      "seeds": sorted(int(s) for s in per_seed)},
           "per_seed": dict(per_seed)}
    try:
        with open(args.baseline) as f:
            base = json.load(f)["per_seed"]
    except FileNotFoundError:
        base = {}
    gaps_w = []
    for s, r in out["per_seed"].items():
        if s in base:
            for k in ("weighted", "minimal", "concat"):
                r[f"vs_{k}"] = round(r["gated_sum"] - base[s][k], 4)
            gaps_w.append(r["vs_weighted"])
    if gaps_w:
        out["gap_vs_weighted_mean"] = round(sum(gaps_w) / len(gaps_w), 4)
        out["gap_vs_weighted_min"] = round(min(gaps_w), 4)
        out["beats_weighted_every_seed"] = bool(min(gaps_w) > 0)
    vals = [r["gated_sum"] for r in per_seed.values()]
    out["mean_miou"] = round(sum(vals) / len(vals), 4)
    return out


if __name__ == "__main__":
    main()
