#!/usr/bin/env python
"""Weighted 3-class training run — the `train_pandaset.py` entry point.

Rebuild of reference train_pandaset.py:79-163: concat-256 model with
num_classes=3 trained on 2-class BEV labels with class weights
[0.39, 2.61, 33.09] for 30 epochs into checkpoints/pandaset_weighted.
(The 3-class/2-label quirk is the reference's own — SURVEY.md §7 fidelity
notes — preserved by default, overridable with --num-classes.)
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")

from scripts.common import (add_common_args, apply_overrides, build_loaders,
                            maybe_resume,
                            apply_env_platform)

from lmsu_tpu.config import preset_pandaset_weighted
from lmsu_tpu.models import get_architecture_summary
from lmsu_tpu.training import Trainer


def main(argv=None) -> float:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--num-classes", type=int, default=3)
    args = p.parse_args(argv)

    cfg = preset_pandaset_weighted()
    cfg = apply_overrides(cfg, args)
    if args.num_classes != cfg.model.num_classes:
        if args.num_classes != len(cfg.train.class_weights):
            p.error(
                f"--num-classes {args.num_classes} does not match the "
                f"preset's {len(cfg.train.class_weights)} class weights "
                f"{cfg.train.class_weights}; the loss would silently "
                f"mis-weight classes (JAX clips out-of-range gathers). "
                f"Adjust TrainConfig.class_weights alongside it.")
        cfg = cfg.replace(model=cfg.model.replace(num_classes=args.num_classes))

    train_loader, val_loader = build_loaders(cfg)
    trainer = Trainer(cfg, train_loader, val_loader)
    summary = get_architecture_summary(
        trainer.model, {"params": trainer.state.params})
    print("Model architecture:")
    for k, v in summary.items():
        print(f"  {k}: {v}")

    start_epoch = maybe_resume(trainer, cfg, args.resume)
    best = trainer.train(start_epoch)
    print(f"Best val mIoU: {best:.4f}")
    return best


if __name__ == "__main__":
    main()
