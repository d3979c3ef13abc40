"""Model tests: shapes, parameter parity, gradient flow, edge cases.

Mirrors the reference's smoke-test intent (test_camera_encoder.py,
test_lidar_encoder.py, test_fusion_module.py) as a real pytest suite
(SURVEY.md §4 implications).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsu_tpu.config import (CameraEncoderConfig, LidarEncoderConfig,
                             ModelConfig)
from lmsu_tpu.models import (CompleteSegmentationModel, LiDAREncoder,
                             TwinLiteEncoder, count_parameters, create_model,
                             get_architecture_summary, init_model)
from lmsu_tpu.ops import weighted_cross_entropy


class TestCameraEncoder:
    @pytest.mark.parametrize("hw", [(64, 64), (128, 128)])
    def test_multiscale_shapes(self, hw):
        cfg = CameraEncoderConfig(base_channels=8, return_multiscale=True)
        enc = TwinLiteEncoder(cfg)
        x = jnp.zeros((2, *hw, 3))
        v = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(v, x)
        H, W = hw
        assert out["stage2"].shape == (2, H // 4, W // 4, 16)
        assert out["stage3"].shape == (2, H // 4, W // 4, 16)
        assert out["stage4"].shape == (2, H // 8, W // 8, 32)
        assert out["stage5"].shape == (2, H // 8, W // 8, 32)

    def test_single_scale(self):
        cfg = CameraEncoderConfig(base_channels=8, return_multiscale=False)
        enc = TwinLiteEncoder(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        v = enc.init(jax.random.PRNGKey(0), x)
        assert enc.apply(v, x).shape == (1, 8, 8, 32)

    def test_reference_param_count(self):
        # reference: 363,520 camera params (architecture.html, SURVEY.md §2).
        enc = TwinLiteEncoder(CameraEncoderConfig())
        v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        assert count_parameters(v["params"]) == 363_520

    def test_remat_option_same_tree_and_grads(self, rng):
        """remat=True: identical param tree + forward, working backward
        (guards the nn.remat static_argnums contract across flax versions)."""
        import dataclasses
        base = CameraEncoderConfig(base_channels=4)
        e1 = TwinLiteEncoder(base)
        e2 = TwinLiteEncoder(dataclasses.replace(base, remat=True))
        x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        v = e1.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == \
            jax.tree_util.tree_structure(e2.init(jax.random.PRNGKey(0), x))
        o1 = e1.apply(v, x)
        o2 = e2.apply(v, x)
        for k in o1:
            np.testing.assert_array_equal(np.asarray(o1[k]),
                                          np.asarray(o2[k]))
        g = jax.grad(lambda p: jnp.sum(e2.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
            mutable=["batch_stats"])[0]["stage5"] ** 2))(v["params"])
        assert bool(jnp.isfinite(jnp.concatenate(
            [a.ravel() for a in jax.tree_util.tree_leaves(g)])).all())


class TestLidarEncoder:
    def test_output_shape_and_zero_empty_cells(self, rng):
        cfg = LidarEncoderConfig(feature_dim=32, mlp_dims=(16, 32),
                                 grid_size=(16, 16))
        enc = LiDAREncoder(cfg)
        pts = jnp.asarray(rng.normal(0, 30, (2, 500, 4)).astype(np.float32))
        v = enc.init(jax.random.PRNGKey(0), pts)
        out = enc.apply(v, pts)
        assert out.shape == (2, 16, 16, 32)
        # Post-ReLU features are >= 0 and empty cells are exactly 0.
        assert float(out.min()) >= 0.0

    def test_all_out_of_range_gives_zero_map(self):
        cfg = LidarEncoderConfig(feature_dim=8, mlp_dims=(8,), grid_size=(8, 8))
        enc = LiDAREncoder(cfg)
        pts = jnp.full((1, 100, 4), 500.0)
        v = enc.init(jax.random.PRNGKey(0), pts)
        assert float(jnp.abs(enc.apply(v, pts)).max()) == 0.0

    def test_point_valid_mask_gates_scatter(self, rng):
        cfg = LidarEncoderConfig(feature_dim=8, mlp_dims=(8,), grid_size=(8, 8))
        enc = LiDAREncoder(cfg)
        pts = jnp.asarray(rng.normal(0, 20, (1, 100, 4)).astype(np.float32))
        v = enc.init(jax.random.PRNGKey(0), pts)
        none_valid = enc.apply(v, pts, point_valid=jnp.zeros((1, 100), bool))
        assert float(jnp.abs(none_valid).max()) == 0.0

    def test_reference_param_count(self):
        # reference: 25,792 LiDAR params.
        enc = LiDAREncoder(LidarEncoderConfig())
        v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 4)))
        assert count_parameters(v["params"]) == 25_792

    def test_pointpillars_encoder(self, rng):
        """The native pillar-feature-net path (reference 2.4 rebuilt)."""
        cfg = LidarEncoderConfig(encoder_type="pointpillars", feature_dim=16,
                                 mlp_dims=(8,), grid_size=(8, 8))
        enc = LiDAREncoder(cfg)
        pts = jnp.asarray(rng.normal(0, 20, (2, 200, 4)).astype(np.float32))
        v = enc.init(jax.random.PRNGKey(0), pts)
        out = enc.apply(v, pts)
        assert out.shape == (2, 8, 8, 16)
        assert float(out.min()) >= 0.0
        # out-of-range -> zero, same contract as spatial
        far = jnp.full((1, 50, 4), 500.0)
        assert float(jnp.abs(enc.apply(v, far)).max()) == 0.0

    def test_pillar_center_consistent_with_index_mapping(self, rng):
        """The PFN's pillar-centre decoration must be self-consistent with
        the scatter index mapping: the decorated centre of a point's cell
        must itself map to the SAME cell (the old /W-grid centres drifted
        into neighbouring mapped cells near the grid edge)."""
        from lmsu_tpu.ops.scatter import points_to_bev_indices
        H = W = 64
        pc = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
        pts = jnp.asarray(rng.uniform(-49.9, 49.9, (1, 2000, 2)),
                          jnp.float32)
        idx, valid = points_to_bev_indices(pts, (H, W), pc)
        col = (idx % W).astype(jnp.float32)
        row = (idx // W).astype(jnp.float32)
        # Same formula as PointPillarsEncoder's decoration.
        cx = pc[0] + (col + 0.5) * (pc[3] - pc[0]) / (W - 1)
        cy = pc[1] + (row + 0.5) * (pc[4] - pc[1]) / (H - 1)
        centers = jnp.stack([cx, cy], axis=-1)
        idx2, valid2 = points_to_bev_indices(centers, (H, W), pc)
        assert bool(valid2[valid].all())
        np.testing.assert_array_equal(np.asarray(idx[valid]),
                                      np.asarray(idx2[valid]))

    def test_bad_encoder_type_raises(self):
        enc = LiDAREncoder(LidarEncoderConfig(encoder_type="bogus"))
        with pytest.raises(ValueError, match="Unknown encoder type"):
            enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 4)))


class TestCompleteModel:
    @pytest.mark.parametrize("fusion_type,out_ch,expected", [
        ("concat", 256, 573_442),
        ("minimal", 128, 494_978),
        ("weighted", 128, 528_132),
        # gated_sum has no reference analog; its gate net is shaped exactly
        # like weighted's (only the output normalization differs), so the
        # count pins that structural claim.
        ("gated_sum", 128, 528_132),
    ])
    def test_reference_param_counts(self, fusion_type, out_ch, expected):
        """Exact parameter parity with fusion_ablation_results.json."""
        cfg = ModelConfig(num_classes=2, fusion_type=fusion_type,
                          fusion_out_channels=out_ch)
        m = create_model(cfg)
        v = init_model(m, jax.random.PRNGKey(0))
        assert count_parameters(v["params"]) == expected

    def test_architecture_summary_split(self):
        # reference: cam 363,520 / LiDAR 25,792 / fusion 161,920 / head 22,210.
        m = create_model(ModelConfig())
        v = init_model(m, jax.random.PRNGKey(0))
        s = get_architecture_summary(m, v)
        assert s["camera_params"] == "363,520"
        assert s["lidar_params"] == "25,792"
        assert s["fusion_params"] == "161,920"
        assert s["head_params"] == "22,210"

    @pytest.mark.parametrize("fusion_type",
                             ["concat", "minimal", "weighted", "gated_sum"])
    def test_forward_and_intermediates(self, small_model_config, sample_batch,
                                       fusion_type):
        cfg = dataclasses.replace(
            small_model_config, fusion_type=fusion_type,
            fusion_out_channels=64 if fusion_type == "concat" else 32)
        m = create_model(cfg)
        v = init_model(m, jax.random.PRNGKey(0), image_size=(64, 64),
                       num_points=1000)
        logits, inter = m.apply(v, sample_batch["image"],
                                sample_batch["points"],
                                return_intermediates=True)
        B = sample_batch["image"].shape[0]
        assert logits.shape == (B, 16, 16, 2)
        assert inter["camera_feat"].shape == (B, 16, 16, 32)
        assert inter["lidar_feat"].shape == (B, 16, 16, 32)
        assert inter["post_fusion"].shape[-1] == (
            64 if fusion_type == "concat" else 32)
        if fusion_type == "concat":
            assert inter["pre_fusion"].shape[-1] == 64  # cam 32 + lidar 32
        assert bool(jnp.isfinite(logits).all())

    def test_x4_head_upsamples(self, small_model_config, sample_batch):
        cfg = dataclasses.replace(small_model_config, output_mode="x4")
        m = create_model(cfg)
        v = init_model(m, jax.random.PRNGKey(0), image_size=(64, 64),
                       num_points=1000)
        logits = m.apply(v, sample_batch["image"], sample_batch["points"])
        assert logits.shape == (2, 64, 64, 2)

    def test_gradient_flow_all_components(self, small_model_config,
                                          sample_batch):
        """Every fusion/head/encoder parameter gets a nonzero gradient after
        one CE backward (reference: test_fusion_module.py:53-64)."""
        m = create_model(small_model_config)
        v = init_model(m, jax.random.PRNGKey(0), image_size=(64, 64),
                       num_points=1000)

        def loss_fn(params):
            logits, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                sample_batch["image"], sample_batch["points"], train=True,
                mutable=["batch_stats"])
            return weighted_cross_entropy(logits, sample_batch["segmentation"])

        grads = jax.grad(loss_fn)(v["params"])
        flat = jax.tree_util.tree_leaves_with_path(grads)
        zero_grads = [jax.tree_util.keystr(k) for k, g in flat
                      if float(jnp.abs(g).max()) == 0.0]
        assert bool(jnp.isfinite(
            jnp.concatenate([g.ravel() for _, g in flat])).all())
        # BatchNorm biases immediately before a ReLU can have transient zero
        # grads; conv kernels must all receive signal.
        kernel_zeros = [k for k in zero_grads if "kernel" in k]
        assert kernel_zeros == [], f"dead kernels: {kernel_zeros}"

    def test_lidar_grid_camera_alignment(self, rng):
        """LiDAR grid coarser than the camera feature map: the model resizes
        the BEV features to the camera resolution before fusion (reference:
        fusion_module.py:239-240; spec test_lidar_encoder.py:183-207)."""
        cfg = ModelConfig(
            num_classes=2, fusion_type="concat", fusion_out_channels=32,
            camera_fpn_channels=16,
            camera=CameraEncoderConfig(base_channels=4),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8)))  # camera gives 16x16
        m = create_model(cfg)
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        pts = jnp.asarray(rng.normal(0, 20, (1, 200, 4)).astype(np.float32))
        v = init_model(m, jax.random.PRNGKey(0), image_size=(64, 64),
                       num_points=200)
        logits, inter = m.apply(v, img, pts, return_intermediates=True)
        assert logits.shape == (1, 16, 16, 2)
        assert inter["lidar_feat"].shape == (1, 16, 16, 16)  # post-resize

    def test_uint8_image_input_matches_float(self, small_model_config, rng):
        """uint8 transport images produce the same logits as float/255."""
        m = create_model(small_model_config)
        img_u8 = rng.integers(0, 256, (1, 64, 64, 3)).astype(np.uint8)
        pts = jnp.asarray(rng.normal(0, 20, (1, 500, 4)).astype(np.float32))
        v = init_model(m, jax.random.PRNGKey(0), image_size=(64, 64),
                       num_points=500)
        out_u8 = m.apply(v, jnp.asarray(img_u8), pts)
        out_f = m.apply(v, jnp.asarray(img_u8.astype(np.float32) / 255.0), pts)
        np.testing.assert_allclose(np.asarray(out_u8), np.asarray(out_f),
                                   atol=1e-5)

    def test_train_eval_modes_differ(self, small_model_config, sample_batch):
        m = create_model(small_model_config)
        v = init_model(m, jax.random.PRNGKey(2), image_size=(64, 64),
                       num_points=1000)
        eval_logits = m.apply(v, sample_batch["image"], sample_batch["points"],
                              train=False)
        train_logits, _ = m.apply(v, sample_batch["image"],
                                  sample_batch["points"], train=True,
                                  mutable=["batch_stats"])
        assert not bool(jnp.allclose(eval_logits, train_logits))


class TestGatedSumFusion:
    """The analysis-driven fourth fusion variant (docs/DESIGN.md "Why
    weighted fusion trails"): independent sigmoid gates instead of the
    softmax, so the fusion can superpose AND mask."""

    def _feats(self):
        rng = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(rng)
        return (jax.random.normal(k1, (2, 8, 8, 16)),
                jax.random.normal(k2, (2, 8, 8, 16)))

    def test_param_tree_matches_weighted(self):
        from lmsu_tpu.models import GatedSumFusion, WeightedFusion
        cam, lid = self._feats()
        vg = GatedSumFusion(16).init(jax.random.PRNGKey(0), cam, lid)
        vw = WeightedFusion(16).init(jax.random.PRNGKey(0), cam, lid)
        assert (jax.tree_util.tree_structure(vg)
                == jax.tree_util.tree_structure(vw))

    def test_zeroed_gate_net_equals_weighted_and_half_sum(self):
        """With attn2 zeroed, sigmoid(0)=0.5 per gate and softmax(0,0)=
        (0.5,0.5) coincide: both fusions emit 0.5*(cam'+lid') for the SAME
        variables (identical trees). With trained-style nonzero attn2 they
        must differ (non-convex vs convex)."""
        from lmsu_tpu.models import GatedSumFusion, WeightedFusion
        cam, lid = self._feats()
        v = GatedSumFusion(16).init(jax.random.PRNGKey(0), cam, lid)
        vz = jax.tree_util.tree_map(lambda x: x, v)
        vz["params"] = dict(vz["params"])
        vz["params"]["attn2_kernel"] = jnp.zeros_like(v["params"]["attn2_kernel"])
        g, _ = GatedSumFusion(16).apply(vz, cam, lid)
        w, _ = WeightedFusion(16).apply(vz, cam, lid)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6, rtol=0)
        g2, _ = GatedSumFusion(16).apply(v, cam, lid)
        w2, _ = WeightedFusion(16).apply(v, cam, lid)
        assert float(jnp.abs(g2 - w2).max()) > 1e-4

    def test_gates_can_exceed_convex_hull(self):
        """Drive both gate logits high: the gated sum approaches cam'+lid'
        (superposition), which no softmax weighting can produce."""
        from lmsu_tpu.models import GatedSumFusion
        cam, lid = self._feats()
        v = GatedSumFusion(16).init(jax.random.PRNGKey(0), cam, lid)
        v = jax.tree_util.tree_map(lambda x: x, v)
        v["params"] = dict(v["params"])
        v["params"]["attn2_kernel"] = jnp.zeros_like(v["params"]["attn2_kernel"])
        v["params"]["attn2_bias"] = jnp.full_like(v["params"]["attn2_bias"], 20.0)
        full, _ = GatedSumFusion(16).apply(v, cam, lid)
        v["params"]["attn2_bias"] = jnp.zeros_like(v["params"]["attn2_bias"])
        half, _ = GatedSumFusion(16).apply(v, cam, lid)
        np.testing.assert_allclose(np.asarray(full), 2 * np.asarray(half),
                                   rtol=1e-4, atol=1e-5)
