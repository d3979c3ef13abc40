"""Single-frame / batch inference — the serving path.

The reference's closest analog is the visualization script's eval loop
(visualize_predictions.py:11-81); BASELINE.md tracks its p50 frame latency.
Predictor wraps a trained model as one jitted forward with optional bf16
compute, accepting uint8 or float images.

    predictor = Predictor.from_checkpoint("checkpoints/run/best.ckpt", cfg)
    mask = predictor.predict_mask(image_u8, points)          # [H, W] int32
    logits = predictor(images, points)                       # batched
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lmsu_tpu.config import ModelConfig
from lmsu_tpu.models import create_model, init_model


class Predictor:
    def __init__(self, config: ModelConfig, variables: Dict[str, Any],
                 freeze_weights: bool = False):
        """freeze_weights=True closes the variables into the jitted
        programs as compile-time CONSTANTS instead of runtime arguments —
        the standard frozen-serving trade. XLA can then constant-fold the
        eval-mode BatchNorms (scale/bias from running stats) into the
        adjacent convolution weights (the fold of ops/ir_fused.py::fold_bn,
        done by the compiler), eliminating the BN ops from the executable.
        Measured on v5e (docs/DESIGN.md "Inference BN folding"): +6.9%
        at B=1 (1.69 -> 1.58 ms/fwd, above the ±2.5% variance band) and
        no change at B=32 (-0.9%) — the batched forward is
        HBM-activation-bound and the fold removes no activation bytes.
        A real but small single-frame serving win; default off because
        weights are pinned at compile time (no hot-swap).
        """
        self.config = config
        self.model = create_model(config)
        self.variables = jax.device_put(variables)
        if freeze_weights:
            const_vars = self.variables
            self._forward = jax.jit(
                lambda v, i, p, pv: self.model.apply(
                    const_vars, i, p, train=False, point_valid=pv))
            self._predict = jax.jit(
                lambda v, i, p, pv: jnp.argmax(
                    self.model.apply(const_vars, i, p, train=False,
                                     point_valid=pv), axis=-1))
        else:
            self._forward = jax.jit(
                lambda v, i, p, pv: self.model.apply(v, i, p, train=False,
                                                     point_valid=pv))
            self._predict = jax.jit(
                lambda v, i, p, pv: jnp.argmax(
                    self.model.apply(v, i, p, train=False, point_valid=pv),
                    axis=-1))

    @classmethod
    def from_checkpoint(cls, path: str, config: ModelConfig,
                        bf16: bool = False,
                        freeze_weights: bool = False) -> "Predictor":
        """Load a trainer checkpoint (plain or KD student layout)."""
        from lmsu_tpu.training.checkpoint import load_model_variables
        if bf16:
            config = dataclasses.replace(config, compute_dtype=jnp.bfloat16)
        return cls(config, load_model_variables(path),
                   freeze_weights=freeze_weights)

    @classmethod
    def from_torch_checkpoint(cls, path: str, config: ModelConfig
                              ) -> "Predictor":
        """Load a reference PyTorch .pth checkpoint directly."""
        from lmsu_tpu.utils.torch_compat import load_torch_checkpoint
        return cls(config, load_torch_checkpoint(path, config))

    def __call__(self, images, points,
                 point_valid=None) -> jnp.ndarray:
        """Batched logits [B, H, W, num_classes].

        Pass the pipeline's `point_valid` mask when the points were
        zero-padded (DataConfig.pad_points_are_valid=False, the default) so
        serving matches training: without it, pad points count as real
        returns at the BEV grid centre.
        """
        pv = None if point_valid is None else jnp.asarray(point_valid)
        return self._forward(self.variables, jnp.asarray(images),
                             jnp.asarray(points), pv)

    def predict_mask(self, image, points, point_valid=None) -> np.ndarray:
        """Single frame -> [H, W] int32 class mask."""
        images = jnp.asarray(image)[None] if np.ndim(image) == 3 \
            else jnp.asarray(image)
        pts = jnp.asarray(points)[None] if np.ndim(points) == 2 \
            else jnp.asarray(points)
        pv = None
        if point_valid is not None:
            pv = jnp.asarray(point_valid)
            if pv.ndim == 1:
                pv = pv[None]
        return np.asarray(self._predict(self.variables, images, pts, pv))[0]
