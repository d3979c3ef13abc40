"""ctypes bindings for the native host preprocessing ops (native/bev_ops.cc).

Loads native/libbev_ops.so when present (build with `make -C native`) and
falls back to the pure-numpy implementations otherwise — behavior is
identical either way (tests/test_native.py asserts equivalence against the
numpy paths / the reference loop semantics).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libbev_ops.so")

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = _declare(ctypes.CDLL(_LIB_PATH))
    except (OSError, AttributeError):
        # Unloadable or stale build (missing symbol): behave as lib-absent so
        # every caller takes its numpy fallback instead of crashing.
        return None
    _lib = lib
    return lib


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.rasterize_bev_first_write.restype = ctypes.c_int64
    lib.rasterize_bev_first_write.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64)]
    lib.sort_points_by_cell.restype = None
    lib.sort_points_by_cell.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
    lib.sample_or_pad_points.restype = ctypes.c_int64
    lib.sample_or_pad_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
    return lib


def native_available() -> bool:
    return _load() is not None


def rasterize_bev_native(
    x: np.ndarray, y: np.ndarray, labels: np.ndarray,
    grid_size: Tuple[int, int] = (64, 64),
    pc_range: Tuple[float, float, float, float] = (-50, 50, -50, 50),
) -> Optional[np.ndarray]:
    """Native first-write-wins rasterization; None if the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    H, W = grid_size
    x_min, x_max, y_min, y_max = pc_range
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    labels = np.ascontiguousarray(labels, np.int64)
    out = np.empty((H, W), np.int64)
    lib.rasterize_bev_first_write(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(x), H, W, x_min, x_max, y_min, y_max,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def sample_or_pad_native(
    points: np.ndarray, max_points: int, seed: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native downsample-or-pad; returns (points [max,4], valid [max]) or
    None if the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    out = np.empty((max_points, 4), np.float32)
    valid = np.empty((max_points,), np.uint8)
    lib.sample_or_pad_points(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        points.shape[0], max_points, ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, valid.astype(bool)


def sort_points_by_cell_native(
    points: np.ndarray, grid_size: Tuple[int, int],
    pc_range: Tuple[float, float, float, float],
    point_valid: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native stable counting sort by BEV cell (invalid last); None if the
    lib is absent. pc_range here is (x_min, x_max, y_min, y_max) — the
    rasterize-style 4-tuple."""
    lib = _load()
    if lib is None:
        return None
    H, W = grid_size
    x_min, x_max, y_min, y_max = pc_range
    points = np.ascontiguousarray(points, np.float32)
    n, dim = points.shape
    out = np.empty_like(points)
    valid_out = np.empty((n,), np.uint8)
    vp = None
    if point_valid is not None:
        vp = np.ascontiguousarray(point_valid, np.uint8)
    lib.sort_points_by_cell(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if vp is not None else None,
        n, dim, H, W, x_min, x_max, y_min, y_max,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, valid_out.astype(bool)
