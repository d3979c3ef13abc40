"""Equivalence tests for the sorted-input MXU scatter-max kernel
(ops/scatter_sorted_pallas.py) against the XLA path, forward and backward,
on CPU interpret mode — same harness as tests/test_pallas.py.

The kernel's input contract is `where(valid, flat_idx, H*W)` non-decreasing
along the point axis; every fixture sorts accordingly (as the data
pipeline's sort_by_bev_cell flag does in production).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsu_tpu.ops.scatter import bev_scatter_max, points_to_bev_indices
from lmsu_tpu.ops.scatter_sorted_pallas import (
    bev_scatter_max_sorted_pallas, sort_points_by_bev_cell)


def _sorted_data(rng, B=2, N=300, C=16, HW=(8, 8), invalid_frac=0.3,
                 dtype=np.float32):
    hw = HW[0] * HW[1]
    feats = rng.normal(0, 1, (B, N, C)).astype(dtype)
    idx = rng.integers(0, hw, (B, N)).astype(np.int32)
    valid = rng.uniform(size=(B, N)) > invalid_frac
    key = np.where(valid, idx, hw)
    order = np.argsort(key, axis=-1, kind="stable")
    feats = np.take_along_axis(feats, order[..., None], axis=1)
    idx = np.take_along_axis(idx, order, axis=1)
    valid = np.take_along_axis(valid, order, axis=1)
    return jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(valid), HW


class TestSortedPallasForward:
    def test_matches_xla(self, rng):
        feats, idx, valid, HW = _sorted_data(rng)
        a = bev_scatter_max(feats, idx, valid, HW)
        b = bev_scatter_max_sorted_pallas(feats, idx, valid, HW)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_matches_xla_bench_like_shape(self, rng):
        # N far beyond one 256-point chunk; hw not a multiple of 128.
        feats, idx, valid, HW = _sorted_data(rng, B=2, N=700, C=8, HW=(6, 6))
        a = bev_scatter_max(feats, idx, valid, HW)
        b = bev_scatter_max_sorted_pallas(feats, idx, valid, HW)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_single_hot_cell_multi_chunk(self, rng):
        # All points in ONE cell: the tile span covers many chunks and the
        # segment straddles every chunk boundary.
        B, N, C = 1, 600, 4
        feats = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
        idx = jnp.full((B, N), 5, jnp.int32)
        valid = jnp.ones((B, N), bool)
        a = bev_scatter_max(feats, idx, valid, (4, 4))
        b = bev_scatter_max_sorted_pallas(feats, idx, valid, (4, 4))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_all_invalid_zero(self):
        feats = jnp.ones((1, 20, 8))
        idx = jnp.zeros((1, 20), jnp.int32)
        out = bev_scatter_max_sorted_pallas(
            feats, idx, jnp.zeros((1, 20), bool), (4, 4))
        assert float(jnp.abs(out).max()) == 0.0

    def test_all_negative_features_land(self, rng):
        # include_self=False semantics: all-negative features still win.
        feats, idx, valid, HW = _sorted_data(rng, B=1, N=64, C=4, HW=(4, 4))
        feats = -jnp.abs(feats) - 1.0
        a = bev_scatter_max(feats, idx, valid, HW)
        b = bev_scatter_max_sorted_pallas(feats, idx, valid, HW)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bfloat16(self, rng):
        feats, idx, valid, HW = _sorted_data(rng, B=1, N=128, C=8,
                                             HW=(4, 4))
        feats = feats.astype(jnp.bfloat16)
        a = bev_scatter_max(feats, idx, valid, HW)
        b = bev_scatter_max_sorted_pallas(feats, idx, valid, HW)
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))


class TestSortedPallasBackward:
    def test_gradient_matches_xla(self, rng):
        feats, idx, valid, HW = _sorted_data(rng, B=2, N=200, C=8, HW=(4, 4))

        ga = jax.grad(lambda f: jnp.sum(
            bev_scatter_max(f, idx, valid, HW) ** 2))(feats)
        gb = jax.grad(lambda f: jnp.sum(
            bev_scatter_max_sorted_pallas(f, idx, valid, HW) ** 2))(feats)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)

    def test_tied_points_split_gradient(self):
        feats = jnp.ones((1, 5, 4))
        idx = jnp.zeros((1, 5), jnp.int32)
        valid = jnp.ones((1, 5), bool)
        g = jax.grad(lambda f: jnp.sum(
            bev_scatter_max_sorted_pallas(f, idx, valid, (2, 2))))(feats)
        np.testing.assert_allclose(float(g.sum()), 4.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g), np.full((1, 5, 4), 0.2),
                                   atol=1e-6)

    def test_ties_across_chunk_boundary(self, rng):
        # One cell, 300 identical points: ties straddle the 256-point chunk
        # boundary; the two-pass count must see ALL of them.
        B, N, C = 1, 300, 4
        feats = jnp.ones((B, N, C))
        idx = jnp.full((B, N), 3, jnp.int32)
        valid = jnp.ones((B, N), bool)
        g = jax.grad(lambda f: jnp.sum(
            bev_scatter_max_sorted_pallas(f, idx, valid, (4, 4))))(feats)
        np.testing.assert_allclose(np.asarray(g), np.full((B, N, C), 1 / N),
                                   rtol=1e-5)

    def test_gradient_multi_chunk_random(self, rng):
        feats, idx, valid, HW = _sorted_data(rng, B=1, N=700, C=4, HW=(4, 4))
        ga = jax.grad(lambda f: jnp.sum(
            jnp.tanh(bev_scatter_max(f, idx, valid, HW))))(feats)
        gb = jax.grad(lambda f: jnp.sum(
            jnp.tanh(bev_scatter_max_sorted_pallas(f, idx, valid, HW))))(
            feats)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)


class TestSortHelperAndEncoder:
    def test_sort_helper_then_kernel_matches_unsorted_xla(self, rng):
        """End-to-end: unsorted points -> device sort helper -> kernel ==
        XLA scatter on the unsorted originals."""
        B, N = 2, 400
        pts = jnp.asarray(rng.normal(0, 25, (B, N, 4)).astype(np.float32))
        pc_range = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
        HW = (8, 8)
        feats_of = lambda p: jnp.tanh(p[..., :1] * jnp.ones((1, 1, 8)))

        idx_u, valid_u = points_to_bev_indices(pts[..., :2], HW, pc_range)
        ref = bev_scatter_max(feats_of(pts), idx_u, valid_u, HW)

        pts_s, pv_s = sort_points_by_bev_cell(pts, HW, pc_range)
        idx_s, valid_s = points_to_bev_indices(pts_s[..., :2], HW, pc_range)
        got = bev_scatter_max_sorted_pallas(
            feats_of(pts_s), idx_s, valid_s & pv_s, HW)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-6)

    def test_encoder_scatter_impl_sorted_pallas(self, rng):
        """The encoder routes scatter_impl='sorted_pallas' and matches the
        XLA-path encoder on pre-sorted points."""
        import dataclasses
        from lmsu_tpu.config import LidarEncoderConfig
        from lmsu_tpu.models.lidar_encoder import SpatialLiDAREncoder
        cfg = LidarEncoderConfig(grid_size=(8, 8), mlp_dims=(8, 16),
                                 feature_dim=8)
        pts = jnp.asarray(rng.normal(0, 25, (2, 200, 4)).astype(np.float32))
        pts, _ = sort_points_by_bev_cell(pts, cfg.grid_size,
                                         cfg.point_cloud_range)
        enc_x = SpatialLiDAREncoder(cfg)
        enc_p = SpatialLiDAREncoder(
            dataclasses.replace(cfg, scatter_impl="sorted_pallas"))
        v = enc_x.init(jax.random.PRNGKey(0), pts)
        a = enc_x.apply(v, pts)
        b = enc_p.apply(v, pts)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestProductionGrid:
    """Multi-TILE coverage: every other fixture has hw <= 128 (one output
    tile), but production runs 64x64 = 4096 cells = 32 tiles. This pins the
    cross-tile span/alignment logic; the TPU-only precision semantics (f32
    at default matmul precision) are pinned on-chip by
    scripts/verify_sorted_scatter_tpu.py, which CPU interpret cannot
    reproduce (CPU f32 dots are exact at any precision)."""

    def test_fwd_bwd_64x64_multi_tile(self, rng):
        feats, idx, valid, HW = _sorted_data(rng, B=1, N=1500, C=8,
                                             HW=(64, 64))
        a = bev_scatter_max(feats, idx, valid, HW)
        b = bev_scatter_max_sorted_pallas(feats, idx, valid, HW)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ga = jax.grad(lambda f: jnp.sum(
            bev_scatter_max(f, idx, valid, HW) ** 2))(feats)
        gb = jax.grad(lambda f: jnp.sum(
            bev_scatter_max_sorted_pallas(f, idx, valid, HW) ** 2))(feats)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-6)

    def test_tie_count_beyond_bf16_exact_range(self):
        # 301 identical points in one cell: the tie count is odd and > 256,
        # i.e. NOT exactly representable in bf16 — pins that the tie-count
        # gather contracts at full f32 precision (a one-pass-bf16 MXU
        # contraction would misround the count and skew the split).
        B, N, C = 1, 301, 8
        feats = jnp.ones((B, N, C))
        idx = jnp.full((B, N), 7, jnp.int32)
        valid = jnp.ones((B, N), bool)
        g = jax.grad(lambda f: jnp.sum(
            bev_scatter_max_sorted_pallas(f, idx, valid, (4, 4))))(feats)
        np.testing.assert_allclose(np.asarray(g), np.full((B, N, C), 1 / N),
                                   rtol=1e-6)


class TestChunkWidthAndScanVariants:
    """The forward chunk width (_CW_FWD) and the scan early-exit are perf
    knobs swept on the real chip (scripts/sweep_sorted_scatter.py); every
    setting must be exactly equivalent. Fixtures force cross-chunk segments
    (a 100-point run) and multi-chunk spans at every width."""

    @pytest.mark.parametrize("cw_fwd", [64, 128, 256])
    @pytest.mark.parametrize("early_exit", [True, False])
    @pytest.mark.parametrize("flat", [True, False])
    def test_fwd_bwd_equivalent(self, rng, monkeypatch, cw_fwd, early_exit,
                                flat):
        import lmsu_tpu.ops.scatter_sorted_pallas as mod
        monkeypatch.setattr(mod, "_CW_FWD", cw_fwd)
        monkeypatch.setattr(mod, "_SCAN_EARLY_EXIT", early_exit)
        monkeypatch.setattr(mod, "_FWD_FLAT", flat)
        feats, idx, valid, HW = _sorted_data(rng, B=2, N=500, C=8, HW=(6, 6))
        # splice in a 100-point single-cell run straddling chunk boundaries
        idx = idx.at[0, 100:200].set(idx[0, 100])
        key = jnp.where(valid, idx, HW[0] * HW[1])
        order = jnp.argsort(key, axis=-1, stable=True)
        idx = jnp.take_along_axis(idx, order, axis=1)
        valid = jnp.take_along_axis(valid, order, axis=1)
        feats = jnp.take_along_axis(feats, order[..., None], axis=1)
        a = bev_scatter_max(feats, idx, valid, HW)
        b = mod.bev_scatter_max_sorted_pallas(feats, idx, valid, HW)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ga = jax.grad(lambda f: jnp.sum(
            bev_scatter_max(f, idx, valid, HW) ** 2))(feats)
        gb = jax.grad(lambda f: jnp.sum(
            mod.bev_scatter_max_sorted_pallas(f, idx, valid, HW) ** 2))(feats)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)

    @pytest.mark.parametrize("tile", [128, 256, 512])
    def test_tile_width_equivalent(self, rng, monkeypatch, tile):
        """_TILE (output cells per tile = one-hot width) is the round-4
        perf knob: larger tiles amortize the per-tile chunk loop. Every
        width must be exactly equivalent, incl. hw not a multiple of the
        tile (last-tile row clamp) and cross-chunk segments."""
        import lmsu_tpu.ops.scatter_sorted_pallas as mod
        monkeypatch.setattr(mod, "_TILE", tile)
        feats, idx, valid, HW = _sorted_data(rng, B=2, N=700, C=8,
                                             HW=(20, 20))  # hw=400
        idx = idx.at[0, 100:300].set(idx[0, 100])  # giant run
        key = jnp.where(valid, idx, HW[0] * HW[1])
        order = jnp.argsort(key, axis=-1, stable=True)
        idx = jnp.take_along_axis(idx, order, axis=1)
        valid = jnp.take_along_axis(valid, order, axis=1)
        feats = jnp.take_along_axis(feats, order[..., None], axis=1)
        a = bev_scatter_max(feats, idx, valid, HW)
        b = mod.bev_scatter_max_sorted_pallas(feats, idx, valid, HW)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ga = jax.grad(lambda f: jnp.sum(
            bev_scatter_max(f, idx, valid, HW) ** 2))(feats)
        gb = jax.grad(lambda f: jnp.sum(
            mod.bev_scatter_max_sorted_pallas(f, idx, valid, HW) ** 2))(feats)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)


class TestSortedPallasOnMesh:
    def _mesh(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        return mesh, NamedSharding(mesh, P("data"))

    def test_sharded_forward_matches_xla(self, rng):
        mesh, dsh = self._mesh()
        feats, idx, valid, HW = _sorted_data(rng, B=8, N=96, C=16, HW=(4, 4))
        f = jax.jit(
            lambda a, b, c: bev_scatter_max_sorted_pallas(a, b, c, HW),
            in_shardings=(dsh, dsh, dsh), out_shardings=dsh)
        out = f(jax.device_put(feats, dsh), jax.device_put(idx, dsh),
                jax.device_put(valid, dsh))
        assert len(out.sharding.device_set) == 8
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(bev_scatter_max(feats, idx, valid,
                                                        HW)))

    def test_sharded_gradient_matches_xla(self, rng):
        mesh, dsh = self._mesh()
        feats, idx, valid, HW = _sorted_data(rng, B=8, N=64, C=8, HW=(4, 4))
        g_pl = jax.jit(jax.grad(lambda f: jnp.sum(
            bev_scatter_max_sorted_pallas(f, idx, valid, HW) ** 2)),
            in_shardings=dsh, out_shardings=dsh)(jax.device_put(feats, dsh))
        g_ref = jax.grad(lambda f: jnp.sum(
            bev_scatter_max(f, idx, valid, HW) ** 2))(feats)
        np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                                   atol=1e-6)


class TestHostKeyParity:
    def test_bev_cell_key_matches_device_indices(self, rng):
        """The host sort key (data/rasterize.py::bev_cell_key) must agree
        with the device index computation on the same fp32 inputs (same op
        order; CPU backend is IEEE like numpy)."""
        from lmsu_tpu.data.rasterize import bev_cell_key
        pts = rng.normal(0, 30, (4, 500, 4)).astype(np.float32)
        pc6 = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
        HW = (64, 64)
        host = bev_cell_key(pts, HW, pc6)
        didx, dvalid = points_to_bev_indices(
            jnp.asarray(pts)[..., :2], HW, pc6)
        dev = np.where(np.asarray(dvalid), np.asarray(didx), 64 * 64)
        np.testing.assert_array_equal(host, dev)

    def test_point_sorter_sample_transform(self, rng):
        from lmsu_tpu.data.rasterize import bev_cell_key, make_point_sorter
        pc6 = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
        sorter = make_point_sorter((8, 8), pc6)
        pts = rng.normal(0, 30, (100, 4)).astype(np.float32)
        pv = rng.uniform(size=100) > 0.5
        out = sorter({"points": pts, "point_valid": pv, "other": 1})
        key = bev_cell_key(out["points"], (8, 8), pc6, out["point_valid"])
        assert (np.diff(key) >= 0).all()
        # Same multiset of (point, valid) pairs.
        a = np.concatenate([pts, pv[:, None]], 1)
        b = np.concatenate([out["points"], out["point_valid"][:, None]], 1)
        np.testing.assert_array_equal(
            np.sort(a.view([('', a.dtype)] * 5), axis=0),
            np.sort(b.view([('', b.dtype)] * 5), axis=0))
        assert out["other"] == 1


class TestWideLanes:
    def test_teacher_width_c256(self, rng):
        """Lane dim beyond one 128-lane tile (the 2x teacher's C=256)."""
        feats, idx, valid, HW = _sorted_data(rng, B=1, N=300, C=256,
                                             HW=(4, 4))
        a = bev_scatter_max(feats, idx, valid, HW)
        b = bev_scatter_max_sorted_pallas(feats, idx, valid, HW)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ga = jax.grad(lambda f: jnp.sum(
            bev_scatter_max(f, idx, valid, HW) ** 2))(feats)
        gb = jax.grad(lambda f: jnp.sum(
            bev_scatter_max_sorted_pallas(f, idx, valid, HW) ** 2))(feats)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-6)
