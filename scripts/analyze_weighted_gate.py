#!/usr/bin/env python
"""Why does weighted fusion trail concat/minimal on the hard benchmark?

fusion_ablation_hard_seeded.json shows the weighted variant behind BOTH
other fusions on every seed (by 3.5-8.8 pt) — the one experimental finding
without an explanation. This script analyzes a TRAINED weighted-fusion
model's per-pixel modality gate (models/fusion.py::WeightedFusion —
reference fusion_module.py:107-136) two ways:

1. **Causal ablation of the gate at eval time** — the gate's output layer
   is an explicit (attn2_kernel, attn2_bias) pair, so editing the loaded
   variables replaces the gate without touching model code:
     * uniform  : attn2_* = 0        -> softmax(0,0) = exactly (0.5, 0.5)
       (turns the fusion into 0.5*(cam+lid) with the trained projections —
       minimal-fusion shape);
     * camera   : bias (+20, -20)    -> weights ~(1, 0);
     * lidar    : bias (-20, +20)    -> weights ~(0, 1).
   Val mIoU of each variant vs the trained gate isolates what the learned
   gate actually contributes.

2. **Gate statistics** on val batches: weight distribution, decisiveness
   (fraction of pixels where one modality gets > 0.7), per-sample spatial
   spread, and the correlation of the LiDAR weight with BEV occupancy
   (cells holding >= 1 LiDAR return) — if the gate reacted to missing
   LiDAR evidence (dropout wedges), that correlation would be negative
   for camera-weight ~ occupancy.

Writes docs/weighted_gate_analysis.json. Default checkpoint: the
hard-benchmark weighted/128 student trained by
scripts/experiment_quant_accuracy.py (val mIoU 0.8756).
"""

import argparse
import copy
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
        train=TrainConfig(class_weights=(0.4, 3.5)))
    return apply_overrides(cfg, args)


def _gate_variant(variables: dict, kind: str) -> dict:
    v = copy.deepcopy(variables)
    attn_k = v["params"]["fusion"]["attn2_kernel"]
    attn_b = v["params"]["fusion"]["attn2_bias"]
    zero_k = np.zeros_like(np.asarray(attn_k))
    if kind == "trained":
        return variables
    if kind == "uniform":
        bias = np.zeros_like(np.asarray(attn_b))
    elif kind == "camera_only":
        bias = np.asarray([20.0, -20.0], np.asarray(attn_b).dtype)
    elif kind == "lidar_only":
        bias = np.asarray([-20.0, 20.0], np.asarray(attn_b).dtype)
    else:
        raise ValueError(kind)
    v["params"]["fusion"]["attn2_kernel"] = zero_k
    v["params"]["fusion"]["attn2_bias"] = bias
    return v


def _eval(predictor, loader, num_classes):
    import jax.numpy as jnp

    from lmsu_tpu.ops.metrics import confusion_matrix
    cm = np.zeros((num_classes, num_classes), np.int64)
    for batch in loader:
        logits = predictor(batch["image"], batch["points"],
                           batch.get("point_valid"))
        cm += np.asarray(confusion_matrix(
            logits, jnp.asarray(batch["segmentation"]), num_classes),
            np.int64)
    return iou_from_confusion(cm)


def gate_statistics(model, variables, loader, cfg, max_batches: int):
    """Per-pixel gate weights recomputed from the captured projections
    and the gate params (host numpy; exact for the captured batches)."""
    import jax

    # Capture ONLY the two fusion projections: the default
    # capture_intermediates=True keeps every submodule output live
    # (camera-stage activations included) and OOMs a 16 GB chip at B=32.
    keep = lambda mdl, _method: mdl.name in ("cam_proj", "lidar_proj")
    fwd = jax.jit(lambda v, i, p, pv: model.apply(
        v, i, p, train=False, point_valid=pv,
        capture_intermediates=keep, mutable=["intermediates"]))
    p = variables["params"]["fusion"]
    w1 = np.asarray(p["attn1_kernel"])[0, 0].astype(np.float64)
    b1 = np.asarray(p["attn1_bias"]).astype(np.float64)
    w2 = np.asarray(p["attn2_kernel"])[0, 0].astype(np.float64)
    b2 = np.asarray(p["attn2_bias"]).astype(np.float64)

    from lmsu_tpu.data.rasterize import bev_cell_key
    H, W = cfg.model.lidar.grid_size
    w_cam_all, occ_all = [], []
    for i, batch in enumerate(loader):
        if i >= max_batches:
            break
        import jax.numpy as jnp
        _, mut = fwd(variables, jnp.asarray(batch["image"]),
                     jnp.asarray(batch["points"]),
                     jnp.asarray(batch["point_valid"])
                     if "point_valid" in batch else None)
        inter = mut["intermediates"]["fusion"]
        cam = np.asarray(inter["cam_proj"]["__call__"][0], np.float64)
        lid = np.asarray(inter["lidar_proj"]["__call__"][0], np.float64)
        h = np.maximum(np.concatenate([cam, lid], axis=-1) @ w1 + b1, 0.0)
        logits = h @ w2 + b2
        e = np.exp(logits - logits.max(-1, keepdims=True))
        w_cam = (e / e.sum(-1, keepdims=True))[..., 0]  # [B, H, W]
        w_cam_all.append(w_cam)

        key = bev_cell_key(batch["points"],
                           cfg.model.lidar.grid_size,
                           cfg.model.lidar.point_cloud_range,
                           batch.get("point_valid"))
        occ = np.zeros((key.shape[0], H * W), bool)
        for b in range(key.shape[0]):
            k = key[b]
            occ[b][k[k < H * W]] = True
        occ_all.append(occ.reshape(-1, H, W))

    w_cam = np.concatenate(w_cam_all)
    occ = np.concatenate(occ_all)
    decisive = float(np.mean(np.maximum(w_cam, 1 - w_cam) > 0.7))
    corr = float(np.corrcoef(w_cam.ravel(), occ.ravel().astype(float))[0, 1])
    return {
        "n_pixels": int(w_cam.size),
        "camera_weight": {
            "mean": round(float(w_cam.mean()), 4),
            "std": round(float(w_cam.std()), 4),
            "p5": round(float(np.percentile(w_cam, 5)), 4),
            "p50": round(float(np.percentile(w_cam, 50)), 4),
            "p95": round(float(np.percentile(w_cam, 95)), 4),
        },
        "decisive_pixel_fraction_gt_0.7": round(decisive, 4),
        "per_sample_spatial_std_mean": round(
            float(w_cam.reshape(w_cam.shape[0], -1).std(axis=1).mean()), 4),
        "corr_camera_weight_vs_bev_occupancy": round(corr, 4),
    }


def main(argv=None) -> dict:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--checkpoint",
                   default="checkpoints/quant_accuracy/best.ckpt")
    p.add_argument("--stat-batches", type=int, default=4)
    p.add_argument("--output", default="docs/weighted_gate_analysis.json")
    args = p.parse_args(argv)

    cfg = _regime(args)
    import jax

    from lmsu_tpu.inference import Predictor
    from lmsu_tpu.training import checkpoint as ckptlib
    variables = ckptlib.load_model_variables(args.checkpoint)
    _, val_loader = build_loaders(cfg, verbose=False)

    pred = Predictor(cfg.model, variables)
    variants = {}
    for kind in ("trained", "uniform", "camera_only", "lidar_only"):
        pred.variables = jax.device_put(_gate_variant(variables, kind))
        m = _eval(pred, val_loader, cfg.model.num_classes)
        variants[kind] = {"miou": round(m["miou"], 6),
                          "class_iou": [round(v, 6) for v in m["class_iou"]]}
        print(f"{kind:>12s}: mIoU {m['miou']:.4f}  "
              f"class IoU {['%.4f' % v for v in m['class_iou']]}", flush=True)

    print("=== gate statistics (trained weights) ===", flush=True)
    stats = gate_statistics(pred.model, jax.device_put(variables),
                            val_loader, cfg, args.stat_batches)
    for k, v in stats.items():
        print(f"  {k}: {v}")

    result = {"benchmark": "synthetic_hard",
              "checkpoint": args.checkpoint,
              "model": "weighted/128 (spatial)",
              "gate_variants_val_miou": variants,
              "gate_stats": stats,
              "gate_contribution_pt": round(
                  100 * (variants["trained"]["miou"]
                         - variants["uniform"]["miou"]), 2)}
    with open(args.output, "w") as f:
        json.dump(result, f, indent=2)
    print(f"Wrote {args.output}")
    return result


if __name__ == "__main__":
    main()
