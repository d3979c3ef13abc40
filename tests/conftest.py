"""Test harness: force an 8-device CPU mesh before JAX initializes.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): XLA's forced host platform device count gives 8 virtual CPU
devices, so sharding/pjit paths run exactly as they would on a v5e-8.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the machine may default to
# a live TPU backend registered by sitecustomize before this file runs);
# the benchmark, not the test suite, runs on the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var may have been latched to another platform at interpreter
# startup; the config update wins as long as no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def sample_batch(rng):
    """A realistic random batch: images in [0,1], points with real ranges."""
    import jax.numpy as jnp
    B, N = 2, 1000
    images = jnp.asarray(rng.uniform(0, 1, (B, 64, 64, 3)).astype(np.float32))
    pts = rng.normal(0, 30, (B, N, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5, 3, (B, N))
    pts[..., 3] = rng.uniform(0, 1, (B, N))
    points = jnp.asarray(pts)
    labels = jnp.asarray(rng.integers(0, 2, (B, 16, 16)).astype(np.int32))
    return {"image": images, "points": points, "segmentation": labels}


@pytest.fixture(scope="session")
def small_model_config():
    """A tiny config so tests compile fast on the 1-vCPU host."""
    from lmsu_tpu.config import CameraEncoderConfig, LidarEncoderConfig, ModelConfig
    return ModelConfig(
        num_classes=2,
        fusion_type="concat",
        fusion_out_channels=64,
        camera_fpn_channels=32,
        camera=CameraEncoderConfig(base_channels=8),
        lidar=LidarEncoderConfig(feature_dim=32, mlp_dims=(16, 32),
                                 grid_size=(16, 16)),
    )
