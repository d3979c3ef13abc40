"""Compute ops: scatter voxelization, resize, losses, metrics, Pallas kernels."""

from lmsu_tpu.ops.losses import (feature_matching_loss, kd_logit_kl,
                                 kd_total_loss, weighted_cross_entropy)
from lmsu_tpu.ops.metrics import (SegmentationMetrics, confusion_matrix,
                                  iou_from_confusion)
from lmsu_tpu.ops.resize import resize_bilinear
from lmsu_tpu.ops.scatter import (bev_scatter_max, bev_scatter_max_fastbwd,
                                  bev_scatter_max_sorted,
                                  bev_voxelize_max, points_to_bev_indices)

__all__ = [
    "weighted_cross_entropy", "kd_logit_kl", "feature_matching_loss",
    "kd_total_loss", "SegmentationMetrics", "confusion_matrix",
    "iou_from_confusion", "resize_bilinear", "bev_scatter_max",
    "bev_scatter_max_fastbwd", "bev_scatter_max_sorted", "bev_voxelize_max",
    "points_to_bev_indices",
]
