#!/usr/bin/env python
"""Quick end-to-end training on the hermetic synthetic dataset.

The minimum runnable slice (SURVEY.md §7 step 5): synthetic data -> concat
fusion model -> 2-class train loop -> training_history.json + checkpoints.
Runs anywhere (CPU mesh or TPU) with no real dataset.
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")

from scripts.common import (add_common_args, apply_overrides, build_loaders,
                            maybe_resume,
                            apply_env_platform)

from lmsu_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from lmsu_tpu.training import Trainer


def main(argv=None) -> float:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    args = p.parse_args(argv)

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=2, fusion_type="concat",
                          fusion_out_channels=256),
        data=DataConfig(dataset="synthetic"),
        train=TrainConfig(num_epochs=5, class_weights=(0.4, 3.5),
                          save_dir="checkpoints/synthetic_concat"))
    cfg = apply_overrides(cfg, args)

    train_loader, val_loader = build_loaders(cfg)
    trainer = Trainer(cfg, train_loader, val_loader)
    start_epoch = maybe_resume(trainer, cfg, args.resume)
    best = trainer.train(start_epoch)
    print(f"Best val mIoU: {best:.4f}")
    return best


if __name__ == "__main__":
    main()
