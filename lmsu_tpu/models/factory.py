"""Model construction, initialization, and parameter accounting."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lmsu_tpu.config import ModelConfig
from lmsu_tpu.models.fusion import CompleteSegmentationModel


def create_model(config: Optional[ModelConfig] = None) -> CompleteSegmentationModel:
    return CompleteSegmentationModel(config or ModelConfig())


def init_model(model: CompleteSegmentationModel, rng: jax.Array,
               image_size: Tuple[int, int] = (256, 256),
               num_points: int = 5000,
               batch_size: int = 1) -> Dict[str, Any]:
    """Initialize variables ({'params', 'batch_stats'}) with dummy inputs."""
    images = jnp.zeros((batch_size, *image_size, 3), jnp.float32)
    points = jnp.zeros((batch_size, num_points,
                        model.config.lidar.input_dim), jnp.float32)
    return model.init(rng, images, points, train=False)


def count_parameters(params) -> int:
    """Trainable parameter count; comparable to the reference's
    count_parameters() (camera_encoder.py:121-123) — BatchNorm running stats
    live in 'batch_stats', not 'params', mirroring torch buffers."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def get_architecture_summary(model: CompleteSegmentationModel,
                             variables) -> Dict[str, str]:
    """Per-subsystem parameter split (reference: fusion_module.py:265-286)."""
    params = variables["params"] if "params" in variables else variables
    def count(name):
        return count_parameters(params.get(name, {}))
    cam = count("camera_encoder")
    lidar = count("lidar_encoder")
    fusion = count("fusion") + count("camera_fpn")
    head = count("head")
    cfg = model.config
    return {
        "camera_params": f"{cam:,}",
        "lidar_params": f"{lidar:,}",
        "fusion_params": f"{fusion:,}",
        "head_params": f"{head:,}",
        "total_params": f"{count_parameters(params):,}",
        "fusion_type": cfg.fusion_type,
        "output_mode": cfg.output_mode,
        "use_multiscale": cfg.camera.return_multiscale,
    }
