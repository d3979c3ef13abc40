"""Unit tests for compute ops: scatter-max, losses, metrics, resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsu_tpu.ops import (bev_scatter_max, bev_voxelize_max, confusion_matrix,
                          iou_from_confusion, kd_logit_kl, points_to_bev_indices,
                          resize_bilinear, weighted_cross_entropy)
from lmsu_tpu.ops.losses import feature_matching_loss

PC_RANGE = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)


def _scatter_max_oracle(feats, idx, valid, H, W):
    """Naive per-point loop mirroring torch scatter_reduce(amax,
    include_self=False) semantics (reference: lidar_encoder.py:90-96)."""
    B, N, C = feats.shape
    out = np.zeros((B, H, W, C), np.float32)
    touched = np.zeros((B, H * W), bool)
    for b in range(B):
        for n in range(N):
            if not valid[b, n]:
                continue
            r, c = divmod(int(idx[b, n]), W)
            if touched[b, idx[b, n]]:
                out[b, r, c] = np.maximum(out[b, r, c], feats[b, n])
            else:
                out[b, r, c] = feats[b, n]
                touched[b, idx[b, n]] = True
    return out


class TestScatter:
    def test_matches_oracle_with_negative_features(self, rng):
        B, N, C, H, W = 2, 200, 8, 8, 8
        feats = rng.normal(0, 1, (B, N, C)).astype(np.float32)  # signed!
        idx = rng.integers(0, H * W, (B, N)).astype(np.int32)
        valid = rng.uniform(size=(B, N)) > 0.3
        out = bev_scatter_max(jnp.asarray(feats), jnp.asarray(idx),
                              jnp.asarray(valid), (H, W))
        np.testing.assert_allclose(np.asarray(out),
                                   _scatter_max_oracle(feats, idx, valid, H, W),
                                   atol=0, rtol=0)

    def test_all_invalid_gives_zeros(self):
        feats = jnp.ones((1, 10, 4))
        out = bev_scatter_max(feats, jnp.zeros((1, 10), jnp.int32),
                              jnp.zeros((1, 10), bool), (4, 4))
        assert float(jnp.abs(out).max()) == 0.0

    def test_out_of_range_points_dropped(self):
        pts = jnp.array([[[500.0, 500.0], [-500.0, 0.0]]])
        idx, valid = points_to_bev_indices(pts, (8, 8), PC_RANGE)
        assert not bool(valid.any())

    def test_index_formula_matches_reference(self):
        # reference lidar_encoder.py:69-79: col from x, row from y,
        # flat = row * W + col with (W-1)/(H-1) scaling and truncation.
        H, W = 64, 64
        pts = jnp.array([[[-50.0, -50.0], [50.0, 50.0], [0.0, 0.0]]])
        idx, valid = points_to_bev_indices(pts, (H, W), PC_RANGE)
        assert bool(valid.all())
        assert idx[0, 0] == 0
        assert idx[0, 1] == (H - 1) * W + (W - 1)
        # (0 - -50)/100 * 63 = 31.5 -> trunc 31
        assert idx[0, 2] == 31 * W + 31

    def test_jit_and_grad(self, rng):
        B, N, C, H, W = 1, 64, 4, 4, 4
        feats = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, H * W, (B, N)).astype(np.int32))
        valid = jnp.asarray(rng.uniform(size=(B, N)) > 0.5)
        f = jax.jit(lambda x: jnp.sum(bev_scatter_max(x, idx, valid, (H, W))))
        g = jax.grad(f)(feats)
        assert g.shape == feats.shape
        assert bool(jnp.isfinite(g).all())

    @pytest.mark.parametrize("collide", [False, True])
    def test_fastbwd_custom_vjp_matches_autodiff(self, rng, collide):
        """bev_scatter_max_fastbwd's 3-pass custom VJP == the default
        autodiff VJP (1 scatter + 4 gathers), including even tie splits."""
        from lmsu_tpu.ops.scatter import bev_scatter_max_fastbwd
        B, N, C, H, W = 2, 300, 8, 8, 8
        feats = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
        hi = 3 if collide else H * W
        idx = jnp.asarray(rng.integers(0, hi, (B, N)).astype(np.int32))
        valid = jnp.asarray(rng.uniform(size=(B, N)) > 0.3)
        # Force exact ties in colliding cells.
        feats = feats.at[:, 1].set(feats[:, 0])
        idx = idx.at[:, 1].set(idx[:, 0])
        g_auto = jax.jit(jax.grad(lambda x: jnp.sum(
            jnp.sin(bev_scatter_max(x, idx, valid, (H, W))))))(feats)
        g_custom = jax.jit(jax.grad(lambda x: jnp.sum(
            jnp.sin(bev_scatter_max_fastbwd(x, idx, valid, (H, W))))))(feats)
        np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_custom),
                                   atol=1e-6)


class TestSortedScatter:
    """bev_scatter_max_sorted: the scatter-free (sort + segmented prefix-max
    + gather) algorithm must be bit-equal to the scatter HLO path, forward
    and backward."""

    def _inputs(self, rng, B=3, N=257, C=8, H=8, W=8, collide=False):
        feats = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
        hi = 4 if collide else H * W  # collide: many points per cell
        idx = jnp.asarray(rng.integers(0, hi, (B, N)).astype(np.int32))
        valid = jnp.asarray(rng.uniform(size=(B, N)) > 0.3)
        return feats, idx, valid, (H, W)

    @pytest.mark.parametrize("collide", [False, True])
    def test_forward_matches_xla(self, rng, collide):
        from lmsu_tpu.ops.scatter import bev_scatter_max_sorted
        feats, idx, valid, gs = self._inputs(rng, collide=collide)
        a = bev_scatter_max(feats, idx, valid, gs)
        b = bev_scatter_max_sorted(feats, idx, valid, gs)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grad_matches_xla_even_tie_split(self, rng):
        from lmsu_tpu.ops.scatter import bev_scatter_max_sorted
        feats, idx, valid, gs = self._inputs(rng)
        # Force ties: duplicate some feature rows pointing at the same cell.
        feats = feats.at[:, 1].set(feats[:, 0])
        idx = idx.at[:, 1].set(idx[:, 0])
        f1 = jax.jit(jax.grad(lambda x: jnp.sum(
            jnp.sin(bev_scatter_max(x, idx, valid, gs)))))
        f2 = jax.jit(jax.grad(lambda x: jnp.sum(
            jnp.sin(bev_scatter_max_sorted(x, idx, valid, gs)))))
        np.testing.assert_allclose(np.asarray(f1(feats)),
                                   np.asarray(f2(feats)), atol=1e-6)

    def test_all_invalid_and_negative_features(self, rng):
        from lmsu_tpu.ops.scatter import bev_scatter_max_sorted
        feats, idx, valid, gs = self._inputs(rng)
        z = bev_scatter_max_sorted(feats, idx, jnp.zeros_like(valid), gs)
        assert float(jnp.abs(z).max()) == 0.0
        negf = -jnp.abs(feats)  # include_self=False: negatives must land
        np.testing.assert_array_equal(
            np.asarray(bev_scatter_max(negf, idx, valid, gs)),
            np.asarray(bev_scatter_max_sorted(negf, idx, valid, gs)))

    def test_encoder_scatter_impl_parity(self, rng):
        """The spatial encoder gives identical outputs under every
        scatter_impl (LidarEncoderConfig.scatter_impl routing)."""
        import dataclasses
        from lmsu_tpu.config import LidarEncoderConfig
        from lmsu_tpu.models.lidar_encoder import LiDAREncoder
        pts = jnp.asarray(rng.normal(0, 30, (2, 128, 4)).astype(np.float32))
        outs = {}
        for impl in ("xla", "xla_fastbwd", "sorted"):
            cfg = LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8), scatter_impl=impl)
            enc = LiDAREncoder(cfg)
            vars_ = enc.init(jax.random.PRNGKey(0), pts, train=False)
            outs[impl] = enc.apply(vars_, pts, train=False)
        np.testing.assert_allclose(np.asarray(outs["xla"]),
                                   np.asarray(outs["sorted"]), atol=1e-6)


class TestLosses:
    def test_ce_matches_torch_semantics(self, rng):
        torch = pytest.importorskip("torch")
        B, H, W, C = 2, 8, 8, 3
        logits = rng.normal(0, 2, (B, H, W, C)).astype(np.float32)
        targets = rng.integers(-1, C, (B, H, W))  # includes ignore_index
        weights = np.array([0.39, 2.61, 33.09], np.float32)

        ours = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                                      jnp.asarray(weights), ignore_index=-1)
        ref = torch.nn.CrossEntropyLoss(ignore_index=-1,
                                        weight=torch.tensor(weights))(
            torch.tensor(logits.transpose(0, 3, 1, 2)),
            torch.tensor(targets, dtype=torch.long))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_ce_unweighted(self, rng):
        torch = pytest.importorskip("torch")
        logits = rng.normal(0, 1, (4, 5, 2)).astype(np.float32)
        targets = rng.integers(0, 2, (4, 5))
        ours = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
        ref = torch.nn.functional.cross_entropy(
            torch.tensor(logits.transpose(0, 2, 1)),
            torch.tensor(targets, dtype=torch.long))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_kd_kl_zero_when_identical(self, rng):
        logits = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32))
        assert abs(float(kd_logit_kl(logits, logits, 2.0))) < 1e-6

    def test_kd_kl_positive_and_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        s = rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32)
        t = rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32)
        T = 3.0
        ours = float(kd_logit_kl(jnp.asarray(s), jnp.asarray(t), T))
        st = torch.log_softmax(torch.tensor(s) / T, dim=-1)
        tt = torch.log_softmax(torch.tensor(t) / T, dim=-1)
        ref = float(torch.nn.functional.kl_div(
            st.flatten(0, 2), tt.flatten(0, 2),
            log_target=True, reduction="batchmean") * T * T)
        assert ours > 0
        np.testing.assert_allclose(ours, ref, rtol=1e-3)

    def test_sample_weight_excludes_padding(self, rng):
        """KL/MSE with a 0-weighted duplicate row equal the unpadded values."""
        from lmsu_tpu.ops.losses import kd_logit_kl, feature_matching_loss
        s2 = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32))
        t2 = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32))
        s3 = jnp.concatenate([s2, s2[:1]])  # padded batch: repeat sample 0
        t3 = jnp.concatenate([t2, t2[:1]])
        w = jnp.asarray([1.0, 1.0, 0.0])
        np.testing.assert_allclose(
            float(kd_logit_kl(s3, t3, 2.0, sample_weight=w)),
            float(kd_logit_kl(s2, t2, 2.0)), rtol=1e-6)
        np.testing.assert_allclose(
            float(feature_matching_loss(s3, t3, sample_weight=w)),
            float(feature_matching_loss(s2, t2)), rtol=1e-6)

    def test_feature_matching_with_projection(self, rng):
        s = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 8)).astype(np.float32))
        t = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 16)).astype(np.float32))
        proj = jnp.asarray(rng.normal(0, 1, (16, 8)).astype(np.float32))
        v = feature_matching_loss(s, t, proj)
        assert np.isfinite(float(v)) and float(v) > 0


class TestMetrics:
    def test_confusion_matches_naive_loop(self, rng):
        # Mirrors the reference's per-pixel Python loop (trainer.py:18-26).
        C = 3
        logits = rng.normal(0, 1, (2, 8, 8, C)).astype(np.float32)
        targets = rng.integers(-1, C, (2, 8, 8))
        cm = np.asarray(confusion_matrix(jnp.asarray(logits),
                                         jnp.asarray(targets), C))
        preds = logits.argmax(-1)
        expect = np.zeros((C, C), np.int64)
        for p, t in zip(preds.reshape(2, -1), targets.reshape(2, -1)):
            for pi, ti in zip(p, t):
                if ti != -1 and 0 <= ti < C and 0 <= pi < C:
                    expect[ti, pi] += 1
        np.testing.assert_array_equal(cm, expect)

    def test_confusion_exact_at_large_counts(self):
        # The MXU-contraction form accumulates 0/1 products in f32: exact
        # below 2^24 per entry. Pin it well beyond int16/bf16 ranges with a
        # 262,144-pixel single-entry batch.
        B, H, W = 1, 512, 512
        logits = np.zeros((B, H, W, 2), np.float32)
        logits[..., 1] = 1.0
        targets = np.ones((B, H, W), np.int32)
        cm = np.asarray(confusion_matrix(jnp.asarray(logits),
                                         jnp.asarray(targets), 2))
        np.testing.assert_array_equal(cm, [[0, 0], [0, B * H * W]])

    def test_iou_empty_class_counts_as_zero(self):
        cm = np.array([[10, 0], [0, 0]])
        out = iou_from_confusion(cm)
        assert out["class_iou"] == [1.0, 0.0]
        assert out["miou"] == 0.5


class TestResize:
    def test_matches_torch_align_corners_false(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(0, 1, (2, 7, 9, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), (13, 5)))
        ref = torch.nn.functional.interpolate(
            torch.tensor(x.transpose(0, 3, 1, 2)), size=(13, 5),
            mode="bilinear", align_corners=False).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_noop_when_same_size(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 2)).astype(np.float32))
        assert resize_bilinear(x, (8, 8)) is x
