#!/usr/bin/env python
"""Int8 (w8a8) PTQ accuracy on a TRAINED model.

ops/quant.py is measured and closed as a *speed* lever
(docs/quant_eval_v5e.json: slower than bf16 on this memory-bound model),
but its accuracy cost was only characterized on random weights (argmax
agreement 99.995%, max logit drift 0.89x range). This experiment measures
the thing a deployment contract actually cares about: **val mIoU of the
int8 path vs the bf16/fp32 path on a trained checkpoint**, on the hard
synthetic benchmark.

Protocol:
  1. train (or --checkpoint to reuse) a weighted/128 student on the hard
     benchmark — the standard kd_lift regime (400/512, 40 epochs);
  2. calibrate activation absmax on --calib-batches TRAIN batches
     (calibration never sees the val split);
  3. evaluate val mIoU three ways with the same Predictor weights:
     fp32 params as trained, and the int8 path; record per-class IoU,
     the mIoU delta, and pixelwise argmax agreement between the paths.

Writes docs/quant_accuracy_v5e.json (or --output).
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")

import numpy as np

from scripts.common import (add_common_args, apply_env_platform,
                            apply_overrides, build_loaders)

from lmsu_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from lmsu_tpu.ops.metrics import iou_from_confusion


def _regime(args) -> ExperimentConfig:
    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=2, fusion_type="weighted",
                          fusion_out_channels=128),
        data=DataConfig(dataset="synthetic", synthetic_difficulty="hard",
                        synthetic_num_train=400, synthetic_num_val=512,
                        batch_size=32),
        train=TrainConfig(num_epochs=40, class_weights=(0.4, 3.5),
                          onchip_epoch=True,
                          save_dir="checkpoints/quant_accuracy"))
    return apply_overrides(cfg, args)


def _eval_predictor(predictor, loader, num_classes: int):
    """Val confusion + per-batch argmax masks (host) for the agreement
    metric."""
    import jax.numpy as jnp

    from lmsu_tpu.ops.metrics import confusion_matrix

    cm = np.zeros((num_classes, num_classes), np.int64)
    masks = []
    for batch in loader:
        logits = predictor(batch["image"], batch["points"],
                           batch.get("point_valid"))
        cm += np.asarray(confusion_matrix(
            logits, jnp.asarray(batch["segmentation"]), num_classes),
            np.int64)
        masks.append(np.asarray(jnp.argmax(logits, axis=-1), np.int32))
    return cm, np.concatenate(masks)


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--checkpoint", default=None,
                   help="reuse a trained checkpoint instead of training")
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--output", default="docs/quant_accuracy_v5e.json")
    args = p.parse_args(argv)

    cfg = _regime(args)
    from lmsu_tpu.inference import Predictor
    from lmsu_tpu.training import Trainer
    from lmsu_tpu.training import checkpoint as ckptlib

    train_loader, val_loader = build_loaders(cfg)
    if args.checkpoint:
        variables = ckptlib.load_model_variables(args.checkpoint)
        trained_miou = None
    else:
        print("=== training the fp32 baseline (hard benchmark) ===",
              flush=True)
        trainer = Trainer(cfg, train_loader, val_loader)
        trained_miou = float(trainer.train())
        del trainer
        # Evaluate the BEST-epoch weights (what a deployment would ship).
        variables = ckptlib.load_model_variables(
            f"{cfg.train.save_dir}/best.ckpt")

    # -- fp32 path ----------------------------------------------------------
    pred = Predictor(cfg.model, variables)
    print("=== evaluating fp32 path ===", flush=True)
    cm_fp, mask_fp = _eval_predictor(pred, val_loader, cfg.model.num_classes)
    fp = iou_from_confusion(cm_fp)

    # -- int8 path (calibrated on train batches only) ------------------------
    calib = []
    for i, batch in enumerate(train_loader):
        if i >= args.calib_batches:
            break
        calib.append(batch)
    print(f"=== calibrating int8 on {len(calib)} train batches ===",
          flush=True)
    pred.quantize(calib)
    print("=== evaluating int8 path ===", flush=True)
    cm_q, mask_q = _eval_predictor(pred, val_loader, cfg.model.num_classes)
    q = iou_from_confusion(cm_q)

    agreement = float((mask_fp == mask_q).mean())
    result = {
        "benchmark": "synthetic_hard",
        "model": f"{cfg.model.fusion_type}/{cfg.model.fusion_out_channels}"
                 f" ({cfg.model.lidar.encoder_type})",
        "regime": "kd_lift (400/512, 40ep)" if not args.checkpoint
                  else f"checkpoint {args.checkpoint}",
        "seed": cfg.train.seed,
        "calib_batches": len(calib),
        "trained_best_miou": trained_miou,
        "fp32": {"miou": round(fp["miou"], 6),
                 "class_iou": [round(v, 6) for v in fp["class_iou"]]},
        "int8": {"miou": round(q["miou"], 6),
                 "class_iou": [round(v, 6) for v in q["class_iou"]]},
        "miou_delta": round(q["miou"] - fp["miou"], 6),
        "argmax_agreement": round(agreement, 6),
    }
    with open(args.output, "w") as f:
        json.dump(result, f, indent=2)
    print(f"\nfp32 mIoU {fp['miou']:.4f} | int8 mIoU {q['miou']:.4f} "
          f"(delta {result['miou_delta']:+.4f}) | argmax agreement "
          f"{agreement:.4%}")
    print(f"Wrote {args.output}")
    return result


if __name__ == "__main__":
    main()
