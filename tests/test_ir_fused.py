"""Fused InvertedResidual Pallas kernels (ops/ir_fused.py) vs the unfused
flax path: forward (eval + train), batch-statistics EMA, and full gradient
equivalence. CPU interpret mode — exact math in fp32 up to summation-order
rounding (near-zero gradients are compared absolutely)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsu_tpu.config import CameraEncoderConfig
from lmsu_tpu.models.camera_encoder import TwinLiteEncoder
from lmsu_tpu.models.layers import InvertedResidual
from lmsu_tpu.ops.ir_fused import (fused_ir_infer, fused_ir_train,
                                   params_from_variables)

VARIANTS = [  # (Cin, Cout, stride, expansion, H)
    (8, 16, 2, 6, 16),   # stride-2 downsampling stage
    (16, 16, 1, 6, 16),  # residual stage
    (8, 8, 1, 1, 16),    # expansion-1 (stage1 pattern)
]


def _unpack(v):
    p = v["params"]
    has_expand = "expand" in p
    Ce = p["depthwise"]["conv"]["kernel"].shape[-1]
    if has_expand:
        w1 = p["expand"]["conv"]["kernel"][0, 0]
        g1 = p["expand"]["bn"]["scale"]
        be1 = p["expand"]["bn"]["bias"]
    else:
        w1 = jnp.zeros((0, Ce))
        g1 = jnp.zeros((Ce,))
        be1 = jnp.zeros((Ce,))
    return (w1, g1, be1, p["depthwise"]["conv"]["kernel"][:, :, 0, :],
            p["depthwise"]["bn"]["scale"], p["depthwise"]["bn"]["bias"],
            p["project"]["conv"]["kernel"][0, 0],
            p["project"]["bn"]["scale"],
            p["project"]["bn"]["bias"]), has_expand


def _block(rng, Cin, Cout, stride, exp, H):
    x = jnp.asarray(rng.normal(0, 1, (3, H, H, Cin)), jnp.float32)
    mod = InvertedResidual(Cout, (stride, stride), expansion_ratio=exp)
    v = mod.init(jax.random.PRNGKey(0), x, True)
    v = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.asarray(rng.normal(0, 1, a.shape), a.dtype),
        v)
    return x, mod, v


class TestFusedInference:
    @pytest.mark.parametrize("variant", VARIANTS)
    def test_matches_flax_eval(self, rng, variant):
        x, mod, v = _block(rng, *variant)
        ref = mod.apply(v, x, train=False)
        got = fused_ir_infer(x, params_from_variables(v), stride=variant[2])
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-5)

    def test_module_dispatch_whole_encoder(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
        enc = TwinLiteEncoder(CameraEncoderConfig())
        v = enc.init(jax.random.PRNGKey(0), x, train=False)
        v = {"params": v["params"],
             "batch_stats": jax.tree_util.tree_map(
                 lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape),
                                       a.dtype), v["batch_stats"])}
        ref = enc.apply(v, x, train=False)
        encf = TwinLiteEncoder(CameraEncoderConfig(fused_inference=True))
        got = encf.apply(v, x, train=False)
        for k in ref:
            np.testing.assert_allclose(np.asarray(ref[k]),
                                       np.asarray(got[k]), atol=1e-5)


class TestGuards:
    def test_narrow_channels_stride2_raises_on_tpu(self, rng, monkeypatch):
        """On real TPUs (non-interpret), stride-2 fused blocks require a
        128-multiple chunk width — the narrow-channel sublane-split
        fallback is interpret-only and would die inside Mosaic."""
        import lmsu_tpu.ops.ir_fused as irf
        monkeypatch.setattr(irf, "_interpret", lambda: False)
        x, mod, v = _block(rng, 8, 16, 2, 6, 16)  # hidden 48: not 128-mult
        params, has_expand = _unpack(v)
        with pytest.raises(ValueError, match="128-multiple hidden width"):
            irf.fused_ir_train(x, *params, 2, has_expand, 1e-5)
        with pytest.raises(ValueError, match="128-multiple hidden width"):
            irf.fused_ir_infer(
                x, irf.params_from_variables(
                    {"params": v["params"],
                     "batch_stats": v["batch_stats"]}), stride=2)

    def test_odd_spatial_stride2_raises(self, rng):
        import lmsu_tpu.ops.ir_fused as irf
        x, mod, v = _block(rng, 8, 16, 2, 6, 16)
        x_odd = x[:, :15, :15]
        params, has_expand = _unpack(v)
        with pytest.raises(ValueError, match="even spatial dims"):
            irf.fused_ir_train(x_odd, *params, 2, has_expand, 1e-5)


class TestFusedTrain:
    @pytest.mark.parametrize("variant", VARIANTS)
    def test_forward_and_stats_match_flax(self, rng, variant):
        x, mod, v = _block(rng, *variant)
        params, has_expand = _unpack(v)
        ref, mut = mod.apply(v, x, train=True, mutable=["batch_stats"])
        got, stats = fused_ir_train(x, *params, variant[2], has_expand,
                                    1e-5)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=2e-5)
        # batch stats: recover the flax batch mean from its EMA update
        old = v["batch_stats"]["depthwise"]["bn"]["mean"]
        new = mut["batch_stats"]["depthwise"]["bn"]["mean"]
        m2_flax = (new - 0.9 * old) / 0.1
        np.testing.assert_allclose(np.asarray(m2_flax),
                                   np.asarray(stats[2]), atol=1e-5)

    @pytest.mark.parametrize("variant", VARIANTS)
    def test_gradients_match_flax(self, rng, variant):
        x, mod, v = _block(rng, *variant)
        params, has_expand = _unpack(v)

        def loss_ref(v_, x_):
            o, _ = mod.apply(v_, x_, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(o))

        def loss_fused(params_, x_):
            o, _ = fused_ir_train(x_, *params_, variant[2], has_expand,
                                  1e-5)
            return jnp.sum(jnp.sin(o))

        gr_v, gr_x = jax.grad(loss_ref, argnums=(0, 1))(v, x)
        gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(params, x)
        grp, _ = _unpack({"params": gr_v["params"],
                          "batch_stats": v["batch_stats"]})
        np.testing.assert_allclose(np.asarray(gr_x), np.asarray(gf_x),
                                   atol=1e-4)
        for a, b in zip(grp, gf_p):
            if a.size == 0:
                continue
            # mixed tolerance: near-zero grads (catastrophic cancellation
            # of O(1) terms) compare absolutely
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-4)

    def test_whole_encoder_grads_and_ema(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
        enc = TwinLiteEncoder(CameraEncoderConfig())
        encf = TwinLiteEncoder(CameraEncoderConfig(fused_train=True))
        v = enc.init(jax.random.PRNGKey(0), x, train=False)
        v = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jnp.asarray(rng.normal(0, 1, a.shape),
                                             a.dtype), v)
        ref, mut_r = enc.apply(v, x, train=True, mutable=["batch_stats"])
        got, mut_f = encf.apply(v, x, train=True, mutable=["batch_stats"])
        for k in ref:
            np.testing.assert_allclose(np.asarray(ref[k]),
                                       np.asarray(got[k]), atol=1e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5),
            mut_r["batch_stats"], mut_f["batch_stats"])

        def loss(e, v_, x_):
            o, _ = e.apply(v_, x_, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.sin(t)) for t in o.values())

        gr = jax.grad(lambda v_: loss(enc, v_, x))(v)
        gf = jax.grad(lambda v_: loss(encf, v_, x))(v)
        # Gradient magnitudes here are O(100); atol 5e-3 still pins ~1e-5
        # relative while tolerating catastrophic cancellation on the few
        # near-zero entries (same mixed-tolerance rationale as the unit
        # test above).
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-4),
            gr["params"], gf["params"])
