"""Label remapping and BEV label rasterization (host-side, vectorized numpy).

Reference semantics (pandaset_dataset.py:13-45) preserved exactly, but
vectorized — the reference loops per point in Python (rasterize_bev:42-45):

  * remap_semantic: PandaSet raw IDs {6,7,8,9,10,12} -> 1 (drivable), else 0.
  * rasterize_bev: first-WRITE-wins per cell where writes only happen into
    cells still holding 0 — for labels in {0,1} this reduces to "cell is 1
    iff any point labeled 1 lands in it", and for general labels it is
    first-NONZERO-wins in point order. Both reproduced here.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Ground, Road, Lane markings, Stop lines, Other markings, Driveway
# (reference: pandaset_dataset.py:13).
DRIVABLE_RAW_IDS = (6, 7, 8, 9, 10, 12)


def remap_semantic(raw_ids: np.ndarray) -> np.ndarray:
    """PandaSet raw class IDs -> {0=background, 1=drivable}."""
    return np.isin(raw_ids, DRIVABLE_RAW_IDS).astype(np.int64)


def rasterize_bev(
    x: np.ndarray, y: np.ndarray, labels: np.ndarray,
    grid_size: Tuple[int, int] = (64, 64),
    pc_range: Tuple[float, float, float, float] = (-50, 50, -50, 50),
) -> np.ndarray:
    """Rasterize per-point labels into an [H, W] int64 label grid."""
    H, W = grid_size
    x_min, x_max, y_min, y_max = pc_range

    mask = np.zeros((H, W), dtype=np.int64)
    m = (x >= x_min) & (x <= x_max) & (y >= y_min) & (y <= y_max)
    x, y, labels = x[m], y[m], labels[m]
    if x.size == 0:
        return mask

    col = np.clip(((x - x_min) / (x_max - x_min) * (W - 1)).astype(int), 0, W - 1)
    row = np.clip(((y - y_min) / (y_max - y_min) * (H - 1)).astype(int), 0, H - 1)
    flat = row * W + col

    # First-nonzero-wins per cell, in point order: among nonzero-labeled
    # points, np.unique(return_index) picks the first occurrence per cell.
    nz = labels != 0
    if nz.any():
        cells, first = np.unique(flat[nz], return_index=True)
        mask.ravel()[cells] = labels[nz][first]
    return mask


def bev_cell_key(points: np.ndarray, grid_size: Tuple[int, int],
                 pc_range6, point_valid: np.ndarray | None = None
                 ) -> np.ndarray:
    """Host replica of ops/scatter.py::points_to_bev_indices as a sort key:
    flat cell id for in-range valid points, H*W (sentinel) otherwise.

    fp32 arithmetic in the same op order as the device computation. (TPU
    fp32 division is not guaranteed correctly rounded, so a point sitting
    exactly on a cell boundary can in principle land one cell off between
    host and device; that can displace isolated boundary points at most —
    see scatter_sorted_pallas module docstring.)
    """
    H, W = grid_size
    x_min, y_min, x_max, y_max = (np.float32(pc_range6[0]),
                                  np.float32(pc_range6[1]),
                                  np.float32(pc_range6[3]),
                                  np.float32(pc_range6[4]))
    x = points[..., 0].astype(np.float32)
    y = points[..., 1].astype(np.float32)
    x_norm = (x - x_min) / (x_max - x_min)
    y_norm = (y - y_min) / (y_max - y_min)
    valid = (x_norm >= 0) & (x_norm <= 1) & (y_norm >= 0) & (y_norm <= 1)
    if point_valid is not None:
        valid &= point_valid
    col = np.clip((x_norm * (W - 1)).astype(np.int32), 0, W - 1)
    row = np.clip((y_norm * (H - 1)).astype(np.int32), 0, H - 1)
    return np.where(valid, row * W + col, H * W).astype(np.int32)


def make_point_sorter(grid_size: Tuple[int, int], pc_range6):
    """Per-sample transform reordering `points` (and `point_valid`) by BEV
    cell id, invalid/out-of-range last — the input contract of the
    sorted-input scatter kernel (ops/scatter_sorted_pallas.py). The model is
    order-invariant (per-point MLP + max pooling), so this transform is
    semantics-preserving for every encoder/scatter; apply AFTER label
    rasterization (it is: rasterization happens inside __getitem__).

    Use as Batcher(..., sample_transform=make_point_sorter(...)). Routes
    through the native O(n + cells) counting sort (native/bev_ops.cc) when
    the library is built; the numpy argsort fallback is bit-identical
    (tests/test_native.py).
    """
    range4 = (pc_range6[0], pc_range6[3], pc_range6[1], pc_range6[4])

    def transform(sample):
        pts = sample["points"]
        pv = sample.get("point_valid")
        out = dict(sample)
        from lmsu_tpu.data.native import sort_points_by_cell_native
        native = sort_points_by_cell_native(pts, grid_size, range4, pv)
        if native is not None:
            out["points"], valid_sorted = native
            if pv is not None:
                out["point_valid"] = valid_sorted
            return out
        key = bev_cell_key(pts, grid_size, pc_range6, pv)
        order = np.argsort(key, kind="stable")
        out["points"] = pts[order]
        if pv is not None:
            out["point_valid"] = pv[order]
        return out

    return transform
