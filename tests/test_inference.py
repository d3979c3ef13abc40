"""Predictor (serving path) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsu_tpu.config import (CameraEncoderConfig, LidarEncoderConfig,
                             ModelConfig)
from lmsu_tpu.inference import Predictor
from lmsu_tpu.models import create_model, init_model


@pytest.fixture(scope="module")
def tiny_cfg():
    return ModelConfig(
        num_classes=2, fusion_type="concat", fusion_out_channels=32,
        camera_fpn_channels=16,
        camera=CameraEncoderConfig(base_channels=4),
        lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                 grid_size=(8, 8)))


class TestPredictor:
    def test_batched_and_single_frame(self, tiny_cfg, rng):
        model = create_model(tiny_cfg)
        variables = init_model(model, jax.random.PRNGKey(0),
                               image_size=(32, 32), num_points=100)
        pred = Predictor(tiny_cfg, variables)
        imgs = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
        pts = rng.normal(0, 20, (2, 100, 4)).astype(np.float32)
        logits = pred(imgs, pts)
        assert logits.shape == (2, 8, 8, 2)
        mask = pred.predict_mask(imgs[0], pts[0])
        assert mask.shape == (8, 8)
        assert mask.dtype in (np.int32, np.int64)
        np.testing.assert_array_equal(
            mask, np.asarray(jnp.argmax(logits[0], -1)))

    def test_freeze_weights_matches_standard(self, tiny_cfg, rng):
        """freeze_weights=True (variables as compile-time constants, so
        XLA can fold eval-mode BN into conv weights) must be numerically
        equivalent to the standard runtime-argument path."""
        model = create_model(tiny_cfg)
        variables = init_model(model, jax.random.PRNGKey(0),
                               image_size=(32, 32), num_points=100)
        # Non-trivial running stats so the BN fold actually has content.
        variables = {
            "params": variables["params"],
            "batch_stats": jax.tree_util.tree_map(
                lambda x: jnp.asarray(
                    rng.uniform(0.5, 2.0, x.shape).astype(np.float32)),
                variables["batch_stats"])}
        imgs = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
        pts = rng.normal(0, 20, (2, 100, 4)).astype(np.float32)
        a = Predictor(tiny_cfg, variables)(imgs, pts)
        b = Predictor(tiny_cfg, variables, freeze_weights=True)(imgs, pts)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_from_checkpoint_roundtrip(self, tiny_cfg, rng, tmp_path):
        from lmsu_tpu.training.checkpoint import save_checkpoint
        model = create_model(tiny_cfg)
        variables = init_model(model, jax.random.PRNGKey(1),
                               image_size=(32, 32), num_points=100)
        save_checkpoint(str(tmp_path), {"state": {
            "step": np.int32(5), "params": variables["params"],
            "batch_stats": variables["batch_stats"], "opt_state": ()}},
            epoch=4, val_miou=0.5)
        pred = Predictor.from_checkpoint(str(tmp_path / "latest.ckpt"),
                                         tiny_cfg)
        imgs = rng.integers(0, 256, (1, 32, 32, 3)).astype(np.uint8)
        pts = rng.normal(0, 20, (1, 100, 4)).astype(np.float32)
        direct = model.apply(variables,
                             jnp.asarray(imgs), jnp.asarray(pts), train=False)
        np.testing.assert_allclose(np.asarray(pred(imgs, pts)),
                                   np.asarray(direct), atol=1e-6)

    @pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                        reason="reference not available")
    def test_from_torch_checkpoint(self, tiny_cfg):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference")
        from src.models.camera_encoder import TwinLiteEncoder as TTE
        from src.models.fusion_module import CompleteSegmentationModel as TCM
        from src.models.lidar_encoder import LiDAREncoder as TLE
        tmodel = TCM(camera_encoder=TTE(return_multiscale=True),
                     lidar_encoder=TLE(encoder_type="spatial",
                                       grid_size=(64, 64)),
                     num_classes=2, fusion_type="concat",
                     fusion_out_channels=256,
                     camera_fpn_stages=["stage3", "stage4", "stage5"],
                     camera_fpn_channels=128, output_mode="same")
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".pth") as f:
            torch.save({"model_state": tmodel.state_dict()}, f.name)
            cfg = ModelConfig(num_classes=2, fusion_type="concat",
                              fusion_out_channels=256)
            pred = Predictor.from_torch_checkpoint(f.name, cfg)
        mask = pred.predict_mask(
            np.zeros((256, 256, 3), np.uint8),
            np.zeros((5000, 4), np.float32))
        assert mask.shape == (64, 64)


class TestExport:
    """jax.export serving artifact: serialize -> deserialize -> same logits."""

    def test_export_roundtrip(self, tiny_cfg, rng, tmp_path):
        from lmsu_tpu.inference import load_exported
        model = create_model(tiny_cfg)
        variables = init_model(model, jax.random.PRNGKey(0),
                               image_size=(32, 32), num_points=100)
        pred = Predictor(tiny_cfg, variables)
        path = str(tmp_path / "student.stablehlo")
        pred.export(path, batch_size=2, image_size=(32, 32), num_points=100)

        serve = load_exported(path)
        imgs = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        pts = rng.normal(0, 20, (2, 100, 4)).astype(np.float32)
        pv = np.ones((2, 100), bool)
        got = serve(imgs, pts, pv)
        want = pred(imgs, pts, point_valid=pv)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_export_without_point_valid(self, tiny_cfg, rng, tmp_path):
        from lmsu_tpu.inference import load_exported
        model = create_model(tiny_cfg)
        variables = init_model(model, jax.random.PRNGKey(0),
                               image_size=(32, 32), num_points=100)
        pred = Predictor(tiny_cfg, variables)
        path = str(tmp_path / "nopv.stablehlo")
        pred.export(path, batch_size=1, image_size=(32, 32), num_points=100,
                    with_point_valid=False)
        serve = load_exported(path)
        imgs = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        pts = rng.normal(0, 20, (1, 100, 4)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(serve(imgs, pts)),
                                   np.asarray(pred(imgs, pts)), atol=1e-5)


class TestPredictorSortedScatter:
    def test_predictor_sorts_for_sorted_pallas(self, rng):
        """A sorted_pallas Predictor accepts UNSORTED points and matches the
        default-impl Predictor on them (the host sort is transparent)."""
        import dataclasses
        from lmsu_tpu.config import ModelConfig, LidarEncoderConfig, \
            CameraEncoderConfig
        from lmsu_tpu.inference import Predictor
        from lmsu_tpu.models import init_model, create_model
        cfg = ModelConfig(
            num_classes=2, fusion_type="minimal", fusion_out_channels=16,
            camera_fpn_channels=8,
            camera=CameraEncoderConfig(base_channels=8),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(16, 16)))
        v = init_model(create_model(cfg), jax.random.PRNGKey(0),
                       batch_size=1, image_size=(64, 64), num_points=64)
        img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        pts = rng.normal(0, 30, (1, 64, 4)).astype(np.float32)
        pv = rng.uniform(size=(1, 64)) > 0.3
        ref = Predictor(cfg, v)
        srt = Predictor(dataclasses.replace(cfg, lidar=dataclasses.replace(
            cfg.lidar, scatter_impl="sorted_pallas")), v)
        a = np.asarray(ref(img, pts, point_valid=pv))
        b = np.asarray(srt(img, pts, point_valid=pv))
        np.testing.assert_allclose(a, b, atol=1e-5)
        # single-frame path too
        ma = ref.predict_mask(img[0], pts[0], point_valid=pv[0])
        mb = srt.predict_mask(img[0], pts[0], point_valid=pv[0])
        np.testing.assert_array_equal(ma, mb)
