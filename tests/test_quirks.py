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
    def test_zero_padded_points_hit_grid_centre_when_valid(self, rng):
        """Reference quirk (pandaset_dataset.py:124-126): zero-pad points
        pass the range check and scatter at the grid-centre cell. With no
        point_valid mask (reference behavior) the centre cell is touched;
        masking them removes the artifact."""
        cfg = LidarEncoderConfig(feature_dim=8, mlp_dims=(8,), grid_size=(8, 8))
        enc = LiDAREncoder(cfg)
        # one real out-of-centre point + 49 zero pads
        pts = np.zeros((1, 50, 4), np.float32)
        pts[0, 0] = [40.0, 40.0, 0.0, 0.5]
        pts = jnp.asarray(pts)
        v = enc.init(jax.random.PRNGKey(0), pts)

        out_quirk = enc.apply(v, pts)  # reference behavior: pads are valid
        # centre cell for (0,0): col=row=trunc((0+50)/100*7)=3
        assert float(jnp.abs(out_quirk[0, 3, 3]).max()) > 0

        mask = jnp.asarray(np.arange(50)[None, :] < 1)
        out_masked = enc.apply(v, pts, point_valid=mask)
        assert float(jnp.abs(out_masked[0, 3, 3]).max()) == 0
