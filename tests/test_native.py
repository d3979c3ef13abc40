"""Native (C++) host-op equivalence tests against the numpy paths."""

import numpy as np
import pytest

from lmsu_tpu.data.native import (native_available, rasterize_bev_native,
                                  sample_or_pad_native)
from lmsu_tpu.data.rasterize import rasterize_bev

pytestmark = pytest.mark.skipif(
    not native_available(),
    reason="native/libbev_ops.so not built (make -C native)")


class TestNativeRasterize:
    def test_matches_numpy_2class(self, rng):
        x = rng.uniform(-60, 60, 2000).astype(np.float32)
        y = rng.uniform(-60, 60, 2000).astype(np.float32)
        labels = rng.integers(0, 2, 2000).astype(np.int64)
        a = rasterize_bev(x, y, labels, (64, 64))
        b = rasterize_bev_native(x, y, labels, (64, 64))
        np.testing.assert_array_equal(a, b)

    def test_matches_numpy_multiclass_order(self, rng):
        # first-nonzero-wins is order-dependent; both must agree exactly.
        x = rng.uniform(-50, 50, 500).astype(np.float32)
        y = rng.uniform(-50, 50, 500).astype(np.float32)
        labels = rng.integers(0, 5, 500).astype(np.int64)
        a = rasterize_bev(x, y, labels, (8, 8))
        b = rasterize_bev_native(x, y, labels, (8, 8))
        np.testing.assert_array_equal(a, b)

    def test_nan_coordinates_dropped_like_numpy(self, rng):
        """NaN x/y (sensor dropout) must be dropped by BOTH paths — the
        inverted C++ range test used to pass NaN through, and casting NaN
        to int64 is undefined behavior (landed at cell (0,0) in practice)."""
        x = rng.uniform(-50, 50, 100).astype(np.float32)
        y = rng.uniform(-50, 50, 100).astype(np.float32)
        x[::7] = np.nan
        y[3::11] = np.nan
        labels = np.ones(100, np.int64)
        a = rasterize_bev(x, y, labels, (16, 16))
        b = rasterize_bev_native(x, y, labels, (16, 16))
        np.testing.assert_array_equal(a, b)
        all_nan = np.full(4, np.nan, np.float32)
        out = rasterize_bev_native(all_nan, all_nan,
                                   np.ones(4, np.int64), (8, 8))
        assert out.sum() == 0

    def test_empty(self):
        out = rasterize_bev_native(np.array([], np.float32),
                                   np.array([], np.float32),
                                   np.array([], np.int64), (8, 8))
        assert out.sum() == 0


class TestNativeSample:
    def test_pad_short_cloud(self, rng):
        pts = rng.normal(0, 1, (10, 4)).astype(np.float32)
        out, valid = sample_or_pad_native(pts, 16, seed=0)
        np.testing.assert_array_equal(out[:10], pts)
        assert (out[10:] == 0).all()
        assert valid.tolist() == [True] * 10 + [False] * 6

    def test_downsample_unique_no_replacement(self, rng):
        pts = np.arange(400, dtype=np.float32).reshape(100, 4)
        out, valid = sample_or_pad_native(pts, 30, seed=7)
        assert valid.all()
        # rows must be distinct original rows
        ids = out[:, 0].astype(int) // 4
        assert len(set(ids.tolist())) == 30
        # deterministic per seed, different across seeds
        out2, _ = sample_or_pad_native(pts, 30, seed=7)
        np.testing.assert_array_equal(out, out2)
        out3, _ = sample_or_pad_native(pts, 30, seed=8)
        assert not np.array_equal(out, out3)


class TestNativeCellSort:
    def test_matches_numpy_stable_argsort(self, rng):
        from lmsu_tpu.data.native import sort_points_by_cell_native
        from lmsu_tpu.data.rasterize import bev_cell_key
        if sort_points_by_cell_native(
                np.zeros((1, 4), np.float32), (4, 4),
                (-1., 1., -1., 1.)) is None:
            import pytest
            pytest.skip("native lib not built")
        pts = rng.normal(0, 30, (5000, 4)).astype(np.float32)
        pv = rng.uniform(size=5000) > 0.2
        pc6 = (-50., -50., -5., 50., 50., 3.)
        out, vout = sort_points_by_cell_native(
            pts, (64, 64), (-50., 50., -50., 50.), pv)
        key = bev_cell_key(pts, (64, 64), pc6, pv)
        order = np.argsort(key, kind="stable")
        np.testing.assert_array_equal(out, pts[order])
        np.testing.assert_array_equal(vout, pv[order])

    def test_point_sorter_uses_same_semantics_without_native(self, rng,
                                                             monkeypatch):
        """make_point_sorter's native and numpy paths agree."""
        from lmsu_tpu.data import native as native_mod
        from lmsu_tpu.data.rasterize import make_point_sorter
        pc6 = (-50., -50., -5., 50., 50., 3.)
        sorter = make_point_sorter((8, 8), pc6)
        pts = rng.normal(0, 30, (200, 4)).astype(np.float32)
        pv = rng.uniform(size=200) > 0.5
        sample = {"points": pts, "point_valid": pv}
        a = sorter(dict(sample))
        monkeypatch.setattr(native_mod, "_load", lambda: None)
        monkeypatch.setattr(native_mod, "_lib", None, raising=False)
        b = sorter(dict(sample))
        np.testing.assert_array_equal(a["points"], b["points"])
        np.testing.assert_array_equal(a["point_valid"], b["point_valid"])
