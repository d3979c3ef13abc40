"""Reference fidelity quirks, preserved on purpose (SURVEY.md §7).

These pin behaviors that look like bugs but are the reference's documented
semantics — changing them would break parity with its published results.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lmsu_tpu.config import (LidarEncoderConfig, preset_fusion_ablation,
                             preset_pandaset_weighted)
from lmsu_tpu.models import LiDAREncoder


class TestPresets:
    def test_pandaset_weighted_matches_reference_script(self):
        """train_pandaset.py:79-163: 3 classes, concat-256, 30 epochs,
        weights [0.39, 2.61, 33.09], 2-class metrics (the quirk)."""
        cfg = preset_pandaset_weighted()
        assert cfg.model.num_classes == 3
        assert cfg.model.fusion_type == "concat"
        assert cfg.model.fusion_out_channels == 256
        assert cfg.train.num_epochs == 30
        assert cfg.train.class_weights == (0.39, 2.61, 33.09)
        assert cfg.train.metrics_num_classes == 2  # trainer.py:78 quirk
        assert cfg.train.save_dir == "checkpoints/pandaset_weighted"

    def test_fusion_ablation_presets(self):
        """train_with_fusion_ablation.py:10-66 per-variant settings."""
        for ft, out_ch in (("concat", 256), ("minimal", 128),
                           ("weighted", 128)):
            cfg = preset_fusion_ablation(ft)
            assert cfg.model.num_classes == 2
            assert cfg.model.fusion_out_channels == out_ch
            assert cfg.train.num_epochs == 20
            assert cfg.train.class_weights == (0.4, 3.5)
            assert cfg.train.save_dir == f"checkpoints/fusion_ablation_{ft}"

    def test_fpn_stages_default_matches_experiments(self):
        """All reference runs select stages 3-5 (train_pandaset.py:120)."""
        cfg = preset_pandaset_weighted()
        assert cfg.model.camera_fpn_stages == ("stage3", "stage4", "stage5")


class TestPadPointQuirk:
    def test_zero_padded_points_are_valid_at_grid_centre(self):
        """Reference quirk (pandaset_dataset.py:124-126 + lidar_encoder.py
        :42-55): zero-pad points pass the range check and are assigned the
        grid-centre cell, so without a point_valid mask they scatter as if
        they were real returns at (0, 0)."""
        from lmsu_tpu.ops.scatter import points_to_bev_indices
        H = W = 8
        pads = jnp.zeros((1, 5, 2))
        idx, valid = points_to_bev_indices(
            pads, (H, W), (-50, -50, -5, 50, 50, 3))
        assert bool(valid.all())  # the quirk: pads count as in-range
        centre = 3 * W + 3  # trunc((0+50)/100 * 7) = 3
        assert (np.asarray(idx) == centre).all()

    def test_point_valid_mask_removes_pad_features(self, rng):
        """Masked pads contribute nothing, even when a real point would."""
        cfg = LidarEncoderConfig(feature_dim=8, mlp_dims=(8,), grid_size=(8, 8))
        enc = LiDAREncoder(cfg)
        # a real near-centre point with nonzero features + 49 zero pads
        pts = np.zeros((1, 50, 4), np.float32)
        pts[0, 0] = [1.0, 1.0, -1.0, 0.9]
        pts = jnp.asarray(pts)
        v = enc.init(jax.random.PRNGKey(0), pts)
        out_all = enc.apply(v, pts)
        mask_none = jnp.zeros((1, 50), bool)
        out_none = enc.apply(v, pts, point_valid=mask_none)
        assert float(jnp.abs(out_all).max()) > 0
        assert float(jnp.abs(out_none).max()) == 0
