"""Segmentation metrics as jitted device ops.

The reference accumulates a confusion matrix with a Python double loop over
every pixel on the host (reference: trainer.py:18-26) — measured during the
survey to rival the model forward itself in wall-clock.  Here the confusion
matrix is one `bincount` of `t * C + p` per batch, fused into the jitted
train/eval step, with only a [C, C] int32 transfer per step.

Matches reference semantics: pixels with target == ignore_index are dropped;
predictions/targets outside [0, C) are dropped (trainer.py:25).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    num_classes: int,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """[C, C] confusion counts (rows = target, cols = prediction)."""
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = targets.astype(jnp.int32)
    valid = ((t != ignore_index)
             & (t >= 0) & (t < num_classes)
             & (preds >= 0) & (preds < num_classes))
    flat = jnp.where(valid, t * num_classes + preds, num_classes * num_classes)
    counts = jnp.bincount(flat.reshape(-1),
                          length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes).astype(jnp.int32)


def iou_from_confusion(confusion: np.ndarray) -> Dict[str, object]:
    """Per-class IoU + mIoU from a [C, C] matrix (reference: trainer.py:28-37).

    Reference parity: a class with empty union scores 0 and still counts in
    the mean.
    """
    confusion = np.asarray(confusion, dtype=np.int64)
    tp = np.diag(confusion).astype(np.float64)
    fp = confusion.sum(axis=0) - tp
    fn = confusion.sum(axis=1) - tp
    denom = tp + fp + fn
    ious = np.where(denom > 0, tp / np.maximum(denom, 1), 0.0)
    return {"class_iou": [float(v) for v in ious], "miou": float(ious.mean())}


class SegmentationMetrics:
    """Host-side accumulator with the reference's interface (trainer.py:9-37),
    backed by the jitted device confusion matrix."""

    def __init__(self, num_classes: int = 2, ignore_index: int = -1):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.reset()

    def reset(self) -> None:
        self.confusion = np.zeros((self.num_classes, self.num_classes),
                                  dtype=np.int64)

    def update(self, logits, targets) -> None:
        cm = confusion_matrix(jnp.asarray(logits), jnp.asarray(targets),
                              self.num_classes, self.ignore_index)
        self.confusion += np.asarray(cm, dtype=np.int64)

    def update_confusion(self, cm) -> None:
        self.confusion += np.asarray(cm, dtype=np.int64)

    def compute(self) -> Dict[str, object]:
        return iou_from_confusion(self.confusion)
