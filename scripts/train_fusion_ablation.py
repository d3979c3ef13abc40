#!/usr/bin/env python
"""Fusion ablation sweep: concat / minimal / weighted.

Rebuild of reference train_with_fusion_ablation.py:69-135: trains each fusion
variant (2-class, weights [0.4, 3.5], 20 epochs) into
checkpoints/fusion_ablation_<type>/ and writes fusion_ablation_results.json
with the exact reference schema (miou + formatted param counts).
Optionally distills each variant from a wider teacher (--kd).
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")

from scripts.common import add_common_args, apply_overrides, build_loaders, apply_env_platform

from lmsu_tpu.config import KDConfig, preset_fusion_ablation
from lmsu_tpu.models import get_architecture_summary
from lmsu_tpu.training import DistillationTrainer, Trainer

VARIANTS = ("concat", "minimal", "weighted")


def train_variant(fusion_type: str, args) -> dict:
    cfg = preset_fusion_ablation(fusion_type)
    cfg = apply_overrides(cfg, args)
    if args.save_dir is None:  # per-variant run dirs unless overridden
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, save_dir=f"{args.run_prefix}_{fusion_type}"))
    if args.kd:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, kd=KDConfig(enabled=True,
                                   teacher_checkpoint=args.teacher_checkpoint)))

    train_loader, val_loader = build_loaders(cfg)
    cls = DistillationTrainer if args.kd else Trainer
    trainer = cls(cfg, train_loader, val_loader)
    params = trainer.state.params
    if args.kd:
        params = params["model"]
    summary = get_architecture_summary(trainer.model, {"params": params})
    print(f"\n=== {fusion_type}: total {summary['total_params']} params, "
          f"fusion {summary['fusion_params']} ===")
    best = trainer.train()
    return {
        "miou": float(best),
        "total_params": summary["total_params"],
        "fusion_params": summary["fusion_params"],
    }


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--variants", nargs="+", default=list(VARIANTS),
                   choices=VARIANTS)
    p.add_argument("--kd", action="store_true",
                   help="distill each variant from a 2x-wide teacher")
    p.add_argument("--teacher-checkpoint", default=None)
    p.add_argument("--output", default="fusion_ablation_results.json")
    p.add_argument("--run-prefix", default="checkpoints/fusion_ablation",
                   help="per-variant run dirs become <prefix>_<type> "
                   "(lets e.g. a hard-benchmark sweep keep its own dirs)")
    args = p.parse_args(argv)

    results = {}
    for ft in args.variants:
        results[ft] = train_variant(ft, args)

    print("\n=== Fusion ablation results ===")
    print(f"{'variant':>10s} {'mIoU':>8s} {'params':>10s}")
    for ft, r in results.items():
        print(f"{ft:>10s} {r['miou']:8.4f} {r['total_params']:>10s}")
    best = max(results, key=lambda k: results[k]["miou"])
    print(f"Best fusion: {best} (mIoU {results[best]['miou']:.4f})")

    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"Wrote {args.output}")
    return results


if __name__ == "__main__":
    main()
