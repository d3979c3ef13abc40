"""Augmentation subsystem tests (ops/augment.py + trainer integration).

The load-bearing property is CROSS-MODAL CONSISTENCY of the lateral mirror:
under the rasterizer's floor(norm*(W-1)) cell mapping, a mirrored point
lands in cell W-2-c, not W-1-c (see ops/augment.py module docstring) — so
the label flip, the point mirror, the scatter output, and the aligned image
flip must all agree on that mapping, pinned here against host
re-rasterization and the real scatter op.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsu_tpu.config import (AugmentConfig, CameraEncoderConfig, DataConfig,
                             ExperimentConfig, KDConfig, LidarEncoderConfig,
                             ModelConfig, TrainConfig)
from lmsu_tpu.data.rasterize import rasterize_bev
from lmsu_tpu.ops.augment import (augment_batch, check_augment_compat,
                                  flip_bev_labels, flip_image)
from lmsu_tpu.ops.scatter import bev_scatter_max, points_to_bev_indices

PC4 = (-50.0, 50.0, -50.0, 50.0)           # (x_min, x_max, y_min, y_max)
PC6 = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)


def _random_batch(rng, B=3, N=400, H=16, W=16, ih=64, iw=64):
    pts = rng.uniform(-60, 60, (B, N, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-3, 2, (B, N))
    pts[..., 3] = rng.uniform(0, 1, (B, N))
    return {
        "image": rng.uniform(0, 1, (B, ih, iw, 3)).astype(np.float32),
        "points": pts,
        "segmentation": rng.integers(0, 2, (B, H, W)).astype(np.int32),
        "sample_index": np.arange(B, dtype=np.int32),
        "sample_mask": np.ones(B, bool),
    }


class TestFlipGeometry:
    def test_labels_match_rerasterized_mirrored_points(self, rng):
        """flip_bev_labels == rasterizing the mirrored points, exactly."""
        H = W = 64
        n = 4000
        x = rng.uniform(-49.99, 49.99, n)
        y = rng.uniform(-49.99, 49.99, n)
        labels = rng.integers(0, 3, n)  # multi-class: order must be kept
        grid = rasterize_bev(x, y, labels, (H, W), PC4)

        rerast = rasterize_bev(-x, y, labels, (H, W), PC4)
        expected = np.asarray(flip_bev_labels(jnp.asarray(grid),
                                              ignore_index=-1))
        # Interior + merged-first columns agree exactly; the vacated last
        # column is ignore on our side, empty (0) on the re-rasterized side.
        np.testing.assert_array_equal(rerast[:, : W - 1],
                                      expected[:, : W - 1])
        assert (expected[:, W - 1] == -1).all()
        assert (rerast[:, W - 1] == 0).all()

    def test_scatter_flip_equivariance(self, rng):
        """Scatter-max of mirrored points == column-mapped scatter-max."""
        B, N, C, H, W = 2, 500, 8, 16, 16
        pts = rng.uniform(-49.9, 49.9, (B, N, 2)).astype(np.float32)
        feats = rng.normal(0, 1, (B, N, C)).astype(np.float32)

        idx, valid = points_to_bev_indices(jnp.asarray(pts), (H, W), PC6)
        bev = np.asarray(bev_scatter_max(jnp.asarray(feats), idx, valid,
                                         (H, W)))

        mirrored = pts.copy()
        mirrored[..., 0] = -mirrored[..., 0]
        idx_m, valid_m = points_to_bev_indices(jnp.asarray(mirrored),
                                               (H, W), PC6)
        bev_m = np.asarray(bev_scatter_max(jnp.asarray(feats), idx_m,
                                           valid_m, (H, W)))

        expected = np.zeros_like(bev)
        expected[:, :, : W - 1] = bev[:, :, : W - 1][:, :, ::-1]
        np.testing.assert_array_equal(bev_m, expected)

    def test_aligned_image_flip_tracks_cell_mapping(self, rng):
        """Aligned mode: image cell c shows original cell W-2-c — the same
        mapping the labels and points follow."""
        H = W = 16
        ih = iw = 64  # 4 px per BEV cell, the synthetic upsample ratio
        cells = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
        img = cells[(np.arange(ih) * H) // ih][:, (np.arange(iw) * W) // iw]

        out = np.asarray(flip_image(jnp.asarray(img)[None], "aligned", W))[0]
        s = iw // W
        for c in range(W - 1):
            block = out[:, c * s:(c + 1) * s]
            col = cells[(np.arange(ih) * H) // ih, W - 2 - c]  # [ih, 3]
            np.testing.assert_allclose(
                block, np.broadcast_to(col[:, None, :], block.shape))
        # vacated right edge replicates its neighbor column
        np.testing.assert_array_equal(out[:, -s:],
                                      np.repeat(out[:, -s - 1: -s], s, axis=1))

    def test_mirror_mode_plain_reverse(self, rng):
        img = rng.uniform(0, 1, (2, 8, 12, 3)).astype(np.float32)
        out = np.asarray(flip_image(jnp.asarray(img), "mirror", 4))
        np.testing.assert_array_equal(out, img[:, :, ::-1])

    def test_padded_sample_flip_invariant(self):
        seg = np.full((2, 8, 8), -1, np.int32)
        out = np.asarray(flip_bev_labels(jnp.asarray(seg), ignore_index=-1))
        np.testing.assert_array_equal(out, seg)


class TestAugmentBatch:
    def test_photometric_bounds_and_untouched_fields(self, rng):
        batch = _random_batch(rng)
        cfg = AugmentConfig(enabled=True, brightness=0.3, contrast=0.4,
                            image_noise_std=0.05)
        out = augment_batch(jax.random.PRNGKey(0), batch, cfg, pc_range=PC4)
        img = np.asarray(out["image"])
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert not np.allclose(img, batch["image"])
        np.testing.assert_array_equal(np.asarray(out["points"]),
                                      batch["points"])
        np.testing.assert_array_equal(np.asarray(out["segmentation"]),
                                      batch["segmentation"])
        np.testing.assert_array_equal(np.asarray(out["sample_index"]),
                                      batch["sample_index"])

    def test_deterministic_in_key(self, rng):
        batch = _random_batch(rng)
        cfg = AugmentConfig(enabled=True, hflip_prob=0.5, brightness=0.2,
                            point_dropout=0.1, point_jitter_xy=0.05)
        a = augment_batch(jax.random.PRNGKey(7), batch, cfg, pc_range=PC4)
        b = augment_batch(jax.random.PRNGKey(7), batch, cfg, pc_range=PC4)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                       np.asarray(y)), a, b)
        c = augment_batch(jax.random.PRNGKey(8), batch, cfg, pc_range=PC4)
        assert not np.array_equal(np.asarray(a["image"]),
                                  np.asarray(c["image"]))

    def test_point_dropout_masks_only(self, rng):
        batch = _random_batch(rng)
        batch["point_valid"] = rng.uniform(0, 1, batch["points"].shape[:2]) < 0.9
        cfg = AugmentConfig(enabled=True, point_dropout=0.3)
        out = augment_batch(jax.random.PRNGKey(1), batch, cfg, pc_range=PC4)
        pv = np.asarray(out["point_valid"])
        assert (~pv | batch["point_valid"]).all()  # only ever drops
        assert pv.sum() < batch["point_valid"].sum()
        np.testing.assert_array_equal(np.asarray(out["points"]),
                                      batch["points"])

    def test_flip_applies_consistently(self, rng):
        batch = _random_batch(rng)
        cfg = AugmentConfig(enabled=True, hflip_prob=1.0)
        out = augment_batch(jax.random.PRNGKey(2), batch, cfg, pc_range=PC4)
        np.testing.assert_allclose(np.asarray(out["points"])[..., 0],
                                   -batch["points"][..., 0], rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out["segmentation"]),
            np.asarray(flip_bev_labels(jnp.asarray(batch["segmentation"]))))

    def test_uint8_image_transport(self, rng):
        batch = _random_batch(rng)
        batch["image"] = (batch["image"] * 255).astype(np.uint8)
        cfg = AugmentConfig(enabled=True, brightness=0.1)
        out = augment_batch(jax.random.PRNGKey(3), batch, cfg, pc_range=PC4)
        assert out["image"].dtype == jnp.float32
        assert float(jnp.max(out["image"])) <= 1.0


class TestCompatRules:
    def test_sorted_pallas_rejects_point_movers(self):
        aug = AugmentConfig(enabled=True, hflip_prob=0.5)
        with pytest.raises(ValueError, match="sorted_pallas"):
            check_augment_compat(aug, "sorted_pallas")
        # photometric/z-only terms are fine with the sorted contract
        check_augment_compat(
            AugmentConfig(enabled=True, brightness=0.2, point_jitter_z=0.1),
            "sorted_pallas")

    def test_cache_teacher_rejects_spatial(self):
        aug = AugmentConfig(enabled=True, hflip_prob=0.5)
        with pytest.raises(ValueError, match="cache_teacher"):
            check_augment_compat(aug, "xla", cache_teacher=True)
        # noisy-student composition is allowed
        check_augment_compat(
            AugmentConfig(enabled=True, brightness=0.2, point_dropout=0.1),
            "xla", cache_teacher=True)


def _tiny_config(tmp_path, augment, kd=None, scan_steps=1):
    return ExperimentConfig(
        model=ModelConfig(
            num_classes=2, fusion_type="concat", fusion_out_channels=32,
            camera_fpn_channels=16,
            camera=CameraEncoderConfig(base_channels=4),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8))),
        data=DataConfig(dataset="synthetic", synthetic_num_train=16,
                        synthetic_num_val=8, image_size=(32, 32),
                        grid_size=(8, 8), max_points=128, batch_size=8),
        train=TrainConfig(num_epochs=1, class_weights=(0.4, 3.5),
                          save_dir=str(tmp_path / "run"), lr=3e-3,
                          scan_steps=scan_steps, augment=augment,
                          kd=kd or KDConfig()),
    )


_AUG = AugmentConfig(enabled=True, hflip_prob=0.5, brightness=0.2,
                     contrast=0.2, image_noise_std=0.02, point_dropout=0.05,
                     point_jitter_z=0.02, intensity_jitter=0.02)


def _loaders(cfg):
    from lmsu_tpu.data import create_datasets, make_loader
    train_ds, val_ds = create_datasets(cfg.data)
    return (make_loader(train_ds, cfg.data.batch_size, shuffle=True,
                        seed=cfg.train.seed),
            make_loader(val_ds, cfg.data.batch_size, shuffle=False))


class TestTrainerIntegration:
    def test_train_epoch_with_augmentation(self, tmp_path):
        from lmsu_tpu.training import Trainer
        cfg = _tiny_config(tmp_path, _AUG, scan_steps=2)
        trainer = Trainer(cfg, *_loaders(cfg))
        loss, metrics = trainer.train_epoch()
        assert np.isfinite(loss)
        vloss, vmetrics = trainer.validate()
        assert np.isfinite(vloss)

    def test_build_rejects_sorted_pallas(self, tmp_path):
        from lmsu_tpu.training import Trainer
        cfg = _tiny_config(tmp_path, _AUG)
        cfg = cfg.replace(model=cfg.model.replace(
            lidar=dataclasses.replace(cfg.model.lidar,
                                      scatter_impl="sorted_pallas")))
        with pytest.raises(ValueError, match="sorted_pallas"):
            Trainer(cfg, *_loaders(cfg))

    def test_kd_inloop_with_augmentation(self, tmp_path):
        from lmsu_tpu.training.distill import DistillationTrainer
        kd = KDConfig(enabled=True, teacher_width_mult=2.0)
        cfg = _tiny_config(tmp_path, _AUG, kd=kd)
        trainer = DistillationTrainer(cfg, *_loaders(cfg))
        loss, _ = trainer.train_epoch()
        assert np.isfinite(loss)
        assert set(trainer.last_loss_parts) >= {"ce", "kl", "feature_mse"}

    def test_kd_cached_noisy_student(self, tmp_path):
        """Photometric-only augmentation composes with the cached teacher
        (noisy-student); the cache is filled from clean inputs."""
        from lmsu_tpu.training.distill import DistillationTrainer
        kd = KDConfig(enabled=True, teacher_width_mult=2.0,
                      cache_teacher=True)
        aug = AugmentConfig(enabled=True, brightness=0.2,
                            image_noise_std=0.02, point_dropout=0.05)
        cfg = _tiny_config(tmp_path, aug, kd=kd)
        trainer = DistillationTrainer(cfg, *_loaders(cfg))
        loss, _ = trainer.train_epoch()
        assert np.isfinite(loss)
        assert trainer.teacher_cache is not None

    def test_kd_cached_rejects_flip(self, tmp_path):
        from lmsu_tpu.training.distill import DistillationTrainer
        kd = KDConfig(enabled=True, cache_teacher=True)
        cfg = _tiny_config(tmp_path, _AUG, kd=kd)
        with pytest.raises(ValueError, match="cache_teacher"):
            DistillationTrainer(cfg, *_loaders(cfg))

    def test_augment_stream_reproducible_across_paths(self, tmp_path):
        """Per-batch and scan_steps paths produce the same augmented stream
        (both derive rng from state.step), hence identical first-step loss
        given identical state/batch."""
        from lmsu_tpu.training import Trainer
        cfg1 = _tiny_config(tmp_path, _AUG, scan_steps=1)
        cfg2 = _tiny_config(tmp_path, _AUG, scan_steps=2)
        t1 = Trainer(cfg1, *_loaders(cfg1))
        t2 = Trainer(cfg2, *_loaders(cfg2))
        l1, _ = t1.train_epoch()
        l2, _ = t2.train_epoch()
        # same data order (same seed), same augmentation stream; scan
        # changes only fusion order -> losses agree to fp tolerance
        assert l1 == pytest.approx(l2, rel=1e-3)
