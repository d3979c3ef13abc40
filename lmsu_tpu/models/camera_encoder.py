"""TwinLite-style lightweight camera encoder (flax, NHWC).

TPU-native rebuild of the reference encoder (reference: camera_encoder.py:56-123):
stem stride-2 conv + 5 InvertedResidual stages; returns either the final
feature map or a multi-scale dict {stage2..stage5}.

Shapes for a 256x256 input, base_channels=32 (NHWC):
  stem    [B, 128, 128, 32]
  stage1  [B, 128, 128, 32]   (expansion 1, stride 1)
  stage2  [B,  64,  64, 64]   (stride 2)
  stage3  [B,  64,  64, 64]
  stage4  [B,  32,  32, 128]  (stride 2)
  stage5  [B,  32,  32, 128]
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from lmsu_tpu.config import CameraEncoderConfig
from lmsu_tpu.models.layers import ConvBNAct, InvertedResidual, relu6


class TwinLiteEncoder(nn.Module):
    """5-stage MobileNetV2-style encoder. Reference: camera_encoder.py:56."""

    config: CameraEncoderConfig = CameraEncoderConfig()
    dtype: Any = jnp.float32

    @property
    def feature_channels(self) -> Dict[str, int]:
        """Channel dims per scale (reference: camera_encoder.py:85-90)."""
        b1, b2, b4 = self.config.channels
        return {"stage2": b2, "stage3": b2, "stage4": b4, "stage5": b4}

    @property
    def out_channels(self) -> int:
        return self.config.channels[2]

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> Union[jnp.ndarray, Dict[str, jnp.ndarray]]:
        b1, b2, b4 = self.config.channels
        kw = dict(dtype=self.dtype,
                  fused_inference=self.config.fused_inference,
                  fused_train=self.config.fused_train)
        Stage = InvertedResidual
        if self.config.remat:
            # static_argnums: `train` (arg 2 incl. self) switches BN mode.
            Stage = nn.remat(InvertedResidual, static_argnums=(2,))
        x = ConvBNAct(b1, (3, 3), strides=(2, 2), act=relu6,
                      name="stem", dtype=self.dtype)(images, train)
        x1 = Stage(b1, (1, 1), expansion_ratio=1,
                   name="stage1", **kw)(x, train)
        x2 = Stage(b2, (2, 2), expansion_ratio=6,
                   name="stage2", **kw)(x1, train)
        x3 = Stage(b2, (1, 1), expansion_ratio=6,
                   name="stage3", **kw)(x2, train)
        x4 = Stage(b4, (2, 2), expansion_ratio=6,
                   name="stage4", **kw)(x3, train)
        x5 = Stage(b4, (1, 1), expansion_ratio=6,
                   name="stage5", **kw)(x4, train)
        if self.config.return_multiscale:
            return {"stage2": x2, "stage3": x3, "stage4": x4, "stage5": x5}
        return x5
