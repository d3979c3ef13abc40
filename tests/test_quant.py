"""Int8 post-training quantization for serving (ops/quant.py + the
variables-driven ConvBNAct path + inference.calibrate_quant).

No reference analog (the reference serves fp32 eager torch); bounds here
are standard w8a8 PTQ expectations: per-op relative error ~1/127 of the
activation range, end-to-end drift small enough that argmax predictions
stay overwhelmingly stable on well-separated logits.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsu_tpu.config import (CameraEncoderConfig, LidarEncoderConfig,
                             ModelConfig)
from lmsu_tpu.models import create_model, init_model
from lmsu_tpu.models.layers import ConvBNAct
from lmsu_tpu.inference import Predictor, calibrate_quant
from lmsu_tpu.ops.quant import int8_pointwise, quantize_acts, quantize_weights


def _tiny_cfg(**kw):
    return ModelConfig(
        num_classes=2, fusion_type="weighted", fusion_out_channels=32,
        camera_fpn_channels=16,
        camera=CameraEncoderConfig(base_channels=8),
        lidar=LidarEncoderConfig(feature_dim=32, mlp_dims=(16, 32),
                                 grid_size=(16, 16)), **kw)


class TestQuantPrimitives:
    def test_weight_roundtrip_error_bound(self, rng):
        w = jnp.asarray(rng.normal(0, 0.3, (64, 32)).astype(np.float32))
        wq, s = quantize_weights(w)
        err = np.abs(np.asarray(wq, np.float32) * np.asarray(s) -
                     np.asarray(w))
        assert err.max() <= float(np.asarray(s).max()) * 0.5 + 1e-7

    def test_act_roundtrip_error_bound(self, rng):
        x = jnp.asarray(rng.normal(0, 2.0, (4, 8, 8, 16)).astype(np.float32))
        absmax = jnp.max(jnp.abs(x))
        xq, s = quantize_acts(x, absmax)
        err = np.abs(np.asarray(xq, np.float32) * float(s) - np.asarray(x))
        assert err.max() <= float(s) * 0.5 + 1e-7

    def test_int8_pointwise_close_to_fp(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (2, 6, 6, 48)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.2, (48, 24)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, (24,)).astype(np.float32))
        ref = jnp.einsum("bhwc,cd->bhwd", x, w) + b
        got = int8_pointwise(x, jnp.max(jnp.abs(x)), w, b, jnp.float32)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 0.05 * scale


class TestConvBNActQuantPath:
    def _block_vars(self, rng, cin=24, cout=16):
        blk = ConvBNAct(cout, (1, 1), act=None)
        x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, cin)).astype(np.float32))
        v = blk.init(jax.random.PRNGKey(0), x)
        # non-trivial running stats so the BN fold actually does something
        stats = {"bn": {"mean": jnp.asarray(
            rng.normal(0, 0.2, (cout,)).astype(np.float32)),
            "var": jnp.asarray(
                rng.uniform(0.5, 2.0, (cout,)).astype(np.float32))}}
        return blk, {"params": v["params"], "batch_stats": stats}, x

    def test_calibrate_then_int8_close(self, rng):
        blk, v, x = self._block_vars(rng)
        ref = blk.apply(v, x, train=False)
        _, mut = blk.apply(v, x, train=False, mutable=["quant_stats"])
        assert float(mut["quant_stats"]["act_absmax"]) == pytest.approx(
            float(jnp.max(jnp.abs(x))))
        got = blk.apply({**v, **mut}, x, train=False)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 0.05 * scale

    def test_train_path_ignores_stats(self, rng):
        blk, v, x = self._block_vars(rng)
        _, mut = blk.apply(v, x, train=False, mutable=["quant_stats"])
        a, _ = blk.apply(v, x, train=True, mutable=["batch_stats"])
        b, _ = blk.apply({**v, **mut}, x, train=True,
                         mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_non_pointwise_not_calibrated(self, rng):
        blk = ConvBNAct(8, (3, 3))
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
        v = blk.init(jax.random.PRNGKey(0), x)
        out, mut = blk.apply(v, x, train=False, mutable=["quant_stats"])
        assert dict(mut.get("quant_stats", {})) == {}
        # and the depthwise case
        blk = ConvBNAct(8, (1, 1), groups=8)
        v = blk.init(jax.random.PRNGKey(0), x)
        _, mut = blk.apply(v, x, train=False, mutable=["quant_stats"])
        assert dict(mut.get("quant_stats", {})) == {}


class TestModelQuant:
    def _model(self, rng):
        cfg = _tiny_cfg()
        model = create_model(cfg)
        v = init_model(model, jax.random.PRNGKey(0), batch_size=1,
                       image_size=(64, 64), num_points=128)
        img = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(
            np.float32))
        pts = jnp.asarray(rng.normal(0, 20, (2, 128, 4)).astype(np.float32))
        return cfg, model, v, img, pts

    def test_calibrate_quant_end_to_end(self, rng):
        cfg, model, v, img, pts = self._model(rng)
        ref = model.apply(v, img, pts, train=False)
        qv = calibrate_quant(model, v, [{"image": img, "points": pts}])
        leaves = jax.tree_util.tree_leaves(qv["quant_stats"])
        assert len(leaves) >= 5  # FPN laterals + fusion projections at least
        got = model.apply(qv, img, pts, train=False)
        assert got.shape == ref.shape
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 0.15 * scale
        # Random-init logits are near-tied at most pixels, so raw argmax
        # agreement is noise; require agreement where fp is decisive.
        margin = jnp.abs(ref[..., 1] - ref[..., 0])
        decisive = margin > 0.1 * scale
        same = jnp.argmax(got, -1) == jnp.argmax(ref, -1)
        agree = float(jnp.sum(same & decisive) / jnp.maximum(
            jnp.sum(decisive), 1))
        assert float(jnp.sum(decisive)) > 0
        assert agree > 0.97

    def test_predictor_quantize(self, rng):
        cfg, model, v, img, pts = self._model(rng)
        pred = Predictor(cfg, v)
        base = np.asarray(pred(img, pts))
        pred.quantize([{"image": img, "points": pts}])
        q = np.asarray(pred(img, pts))
        assert q.shape == base.shape and np.isfinite(q).all()
        mask = pred.predict_mask(np.asarray(img[0]), np.asarray(pts[0]))
        assert mask.shape == (16, 16)

    def test_export_bakes_quantized_graph(self, rng, tmp_path):
        # Predictor.quantize() then export(): the artifact serves the int8
        # graph (quant_stats ride self.variables into the baked constants)
        # and reproduces the in-process quantized forward exactly.
        from lmsu_tpu.inference import load_exported
        cfg, model, v, img, pts = self._model(rng)
        pred = Predictor(cfg, v)
        pred.quantize([{"image": img, "points": pts}])
        want = np.asarray(pred(img[:1], pts[:1]))
        path = str(tmp_path / "quant.stablehlo")
        pred.export(path, batch_size=1, image_size=(64, 64), num_points=128,
                    with_point_valid=False)
        served = load_exported(path)
        got = np.asarray(served(np.asarray(img[:1]), np.asarray(pts[:1])))
        # Same int8 graph, separately compiled: XLA may reassociate the f32
        # dequant epilogues, so allow float-ulp drift but require identical
        # decisions.
        scale = float(np.abs(want).max())
        assert float(np.abs(got - want).max()) < 1e-5 * scale
        np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
