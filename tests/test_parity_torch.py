"""Numerical parity against the PyTorch reference as an oracle.

Instantiates the *actual reference implementation* (imported read-only from
/root/reference), copies its randomly initialized weights into the flax model
via lmsu_tpu.utils.torch_compat, and compares outputs on shared random inputs.
This is the "bit-comparable 2-class predictions" bar from BASELINE.md: argmax
must agree everywhere the logit margin exceeds float tolerance.

Requires torch + the reference checkout; skipped cleanly if either is absent.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
sys.path.insert(0, REFERENCE_ROOT)

try:
    from src.models.camera_encoder import TwinLiteEncoder as TorchTwinLite
    from src.models.fusion_module import \
        CompleteSegmentationModel as TorchComplete
    from src.models.lidar_encoder import LiDAREncoder as TorchLiDAR
    HAVE_REFERENCE = True
except Exception:  # pragma: no cover
    HAVE_REFERENCE = False

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE,
                                reason="reference repo not importable")

import jax  # noqa: E402

# Reduced-precision convs (bf16-ish) are the JAX default; parity needs exact
# fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

from lmsu_tpu.config import ModelConfig  # noqa: E402
from lmsu_tpu.models import create_model  # noqa: E402
from lmsu_tpu.utils.torch_compat import convert_torch_state_dict  # noqa: E402


def _build_torch_model(fusion_type: str, out_ch: int, num_classes: int = 2,
                       output_mode: str = "same") -> torch.nn.Module:
    cam = TorchTwinLite(return_multiscale=True)
    lidar = TorchLiDAR(encoder_type="spatial", grid_size=(64, 64),
                       use_vectorized=True)
    return TorchComplete(
        camera_encoder=cam, lidar_encoder=lidar, num_classes=num_classes,
        fusion_type=fusion_type, fusion_out_channels=out_ch,
        camera_fpn_stages=["stage3", "stage4", "stage5"],
        camera_fpn_channels=128, output_mode=output_mode)


def _random_inputs(rng, batch=2, n_points=2000):
    images = rng.uniform(0, 1, (batch, 256, 256, 3)).astype(np.float32)
    pts = rng.normal(0, 30, (batch, n_points, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5, 3, (batch, n_points))
    pts[..., 3] = rng.uniform(0, 1, (batch, n_points))
    return images, pts


@pytest.mark.parametrize("fusion_type,out_ch", [
    ("concat", 256), ("minimal", 128), ("weighted", 128)])
def test_full_model_logit_parity(fusion_type, out_ch):
    torch.manual_seed(42)
    tmodel = _build_torch_model(fusion_type, out_ch).eval()

    cfg = ModelConfig(num_classes=2, fusion_type=fusion_type,
                      fusion_out_channels=out_ch)
    jmodel = create_model(cfg)
    variables = convert_torch_state_dict(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(7)
    images, pts = _random_inputs(rng)

    with torch.no_grad():
        t_logits = tmodel(torch.tensor(images.transpose(0, 3, 1, 2)),
                          torch.tensor(pts)).numpy().transpose(0, 2, 3, 1)
    j_logits = np.asarray(jmodel.apply(variables, jnp.asarray(images),
                                       jnp.asarray(pts), train=False))

    np.testing.assert_allclose(j_logits, t_logits, atol=5e-4, rtol=1e-3)

    # Bit-comparable argmax: disagreement allowed only where the torch top-2
    # margin is inside float tolerance.
    t_pred = t_logits.argmax(-1)
    j_pred = j_logits.argmax(-1)
    sorted_logits = np.sort(t_logits, axis=-1)
    margin = sorted_logits[..., -1] - sorted_logits[..., -2]
    disagree = (t_pred != j_pred)
    assert not (disagree & (margin > 1e-3)).any(), (
        f"{disagree.sum()} argmax mismatches with margin > 1e-3")


def test_intermediates_parity():
    torch.manual_seed(3)
    tmodel = _build_torch_model("concat", 256).eval()
    cfg = ModelConfig(num_classes=2, fusion_type="concat",
                      fusion_out_channels=256)
    jmodel = create_model(cfg)
    variables = convert_torch_state_dict(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(11)
    images, pts = _random_inputs(rng, batch=1, n_points=500)

    with torch.no_grad():
        _, t_inter = tmodel(torch.tensor(images.transpose(0, 3, 1, 2)),
                            torch.tensor(pts), return_intermediates=True)
    _, j_inter = jmodel.apply(variables, jnp.asarray(images), jnp.asarray(pts),
                              train=False, return_intermediates=True)
    for key in ("camera_feat", "lidar_feat", "pre_fusion", "post_fusion"):
        t = t_inter[key].numpy().transpose(0, 2, 3, 1)
        j = np.asarray(j_inter[key])
        np.testing.assert_allclose(j, t, atol=5e-4, rtol=1e-3, err_msg=key)


def test_x4_head_parity():
    torch.manual_seed(5)
    tmodel = _build_torch_model("minimal", 128, output_mode="x4").eval()
    cfg = ModelConfig(num_classes=2, fusion_type="minimal",
                      fusion_out_channels=128, output_mode="x4")
    jmodel = create_model(cfg)
    variables = convert_torch_state_dict(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(13)
    images, pts = _random_inputs(rng, batch=1, n_points=500)
    with torch.no_grad():
        t_logits = tmodel(torch.tensor(images.transpose(0, 3, 1, 2)),
                          torch.tensor(pts)).numpy().transpose(0, 2, 3, 1)
    j_logits = np.asarray(jmodel.apply(variables, jnp.asarray(images),
                                       jnp.asarray(pts), train=False))
    assert j_logits.shape == t_logits.shape == (1, 256, 256, 2)
    np.testing.assert_allclose(j_logits, t_logits, atol=1e-3, rtol=1e-3)


def test_3class_weighted_run_config_parity():
    """The pandaset_weighted entry point's exact config (train_pandaset.py:117)."""
    torch.manual_seed(9)
    tmodel = _build_torch_model("concat", 256, num_classes=3).eval()
    cfg = ModelConfig(num_classes=3, fusion_type="concat",
                      fusion_out_channels=256)
    jmodel = create_model(cfg)
    variables = convert_torch_state_dict(tmodel.state_dict(), cfg)
    t_count = sum(p.numel() for p in tmodel.parameters() if p.requires_grad)
    from lmsu_tpu.models import count_parameters
    assert count_parameters(variables["params"]) == t_count

    rng = np.random.default_rng(17)
    images, pts = _random_inputs(rng, batch=1, n_points=500)
    with torch.no_grad():
        t_logits = tmodel(torch.tensor(images.transpose(0, 3, 1, 2)),
                          torch.tensor(pts)).numpy().transpose(0, 2, 3, 1)
    j_logits = np.asarray(jmodel.apply(variables, jnp.asarray(images),
                                       jnp.asarray(pts), train=False))
    np.testing.assert_allclose(j_logits, t_logits, atol=5e-4, rtol=1e-3)
