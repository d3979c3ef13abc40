"""Bilinear resize with PyTorch `align_corners=False` semantics.

The reference uses F.interpolate(..., mode="bilinear", align_corners=False) in
the camera FPN and for camera/LiDAR alignment (reference: fusion_module.py:62,
88,103,124,240).  `jax.image.resize` with the "linear" method uses half-pixel
sample positions, which is exactly the align_corners=False convention, so the
two agree to float tolerance (verified in tests/test_parity_torch.py).

Layout note: everything in this framework is NHWC (TPU-native); the reference
is NCHW.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Resize NHWC (or HWC) images to `size` = (H, W), half-pixel bilinear."""
    if x.ndim == 4:
        out_shape = (x.shape[0], size[0], size[1], x.shape[3])
    elif x.ndim == 3:
        out_shape = (size[0], size[1], x.shape[2])
    else:
        raise ValueError(f"expected NHWC or HWC input, got shape {x.shape}")
    if x.shape[-3:-1] == tuple(size):
        return x
    # antialias=False matches torch's default interpolate behavior.
    return jax.image.resize(x, out_shape, method="bilinear", antialias=False)
