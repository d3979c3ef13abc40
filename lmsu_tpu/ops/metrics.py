"""Segmentation metrics as jitted device ops.

The reference accumulates a confusion matrix with a Python double loop over
every pixel on the host (reference: trainer.py:18-26) — measured during the
survey to rival the model forward itself in wall-clock.  Here the confusion
matrix is one one-hot x one-hot MXU contraction per batch, fused into the
jitted train/eval step, with only a [C, C] int32 transfer per step.

(A first version used `jnp.bincount` of `t * C + p`; that lowers to a
scatter-add, which TPUs execute row-serially — measured ~2.4 ms for the
131k pixels of a B=32 step, i.e. ~8% of the whole benched KD step hiding
inside "metrics". The contraction form is exact — 0/1 operands survive any
MXU operand truncation and the f32 accumulator is exact below 2^24 counts
per entry — and runs in microseconds.)

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
    c = jnp.arange(num_classes, dtype=jnp.int32)
    oh_t = ((t[..., None] == c) & valid[..., None]).astype(jnp.float32)
    oh_p = (preds[..., None] == c).astype(jnp.float32)
    n = oh_t.size // num_classes
    cm = jax.lax.dot_general(
        oh_t.reshape(n, num_classes), oh_p.reshape(n, num_classes),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return cm.astype(jnp.int32)


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
