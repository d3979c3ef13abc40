"""Shared flax building blocks, NHWC layout.

TPU-first counterparts of the reference's torch blocks:
  InvertedResidual        reference: camera_encoder.py:9-51
  Conv1x1 (+BN+ReLU)      reference: fusion_module.py:8-17
  DWSeparableConv         reference: fusion_module.py:20-34

Parity notes:
  * Explicit symmetric padding ((1,1),(1,1)) for 3x3 convs — torch `padding=1`.
    (flax "SAME" with stride 2 pads asymmetrically and would NOT match.)
  * BatchNorm: flax momentum 0.9 == torch momentum 0.1; epsilon 1e-5 matches
    the torch default. Training mode normalizes with batch statistics, eval
    uses running averages — same as torch.
  * BatchNorm under data parallelism: the trainer runs jit + NamedSharding
    (GSPMD), where nn.BatchNorm's mean/var reductions span the full global
    sharded batch — XLA inserts the cross-chip all-reduce. Batch statistics
    are therefore GLOBAL-batch (effectively "synced BN"); there is no
    per-replica-stats mode and no axis_name knob (one existed, untestable
    under jit, and was removed). Pinned by
    tests/test_multichip.py::test_batchnorm_stats_are_global_batch.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# MobileNet-style fan-out init: healthy variance through depthwise stacks.
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class ConvBNAct(nn.Module):
    """Conv2D + BatchNorm + optional activation."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    act: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = relu6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = tuple((k // 2, k // 2) for k in self.kernel_size)
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=pad, feature_group_count=self.groups,
                    use_bias=self.use_bias, kernel_init=conv_init,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name="bn")(x)
        if self.act is not None:
            x = self.act(x)
        return x


class InvertedResidual(nn.Module):
    """MobileNetV2 expand -> depthwise -> project, residual when shapes match.

    Reference: camera_encoder.py:9-51. ReLU6 activations; no activation after
    the projection BN; residual iff stride == 1 and in_ch == out_ch.
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    expansion_ratio: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expansion_ratio))
        use_residual = self.strides == (1, 1) and in_ch == self.features
        y = x
        if self.expansion_ratio != 1:
            y = ConvBNAct(hidden, (1, 1), act=relu6, dtype=self.dtype,
                          name="expand")(y, train)
        y = ConvBNAct(hidden, (3, 3), strides=self.strides, groups=hidden,
                      act=relu6, dtype=self.dtype,
                      name="depthwise")(y, train)
        y = ConvBNAct(self.features, (1, 1), act=None, dtype=self.dtype,
                      name="project")(y, train)
        return x + y if use_residual else y


class Conv1x1Block(nn.Module):
    """1x1 conv + BN + ReLU. Reference: fusion_module.py:8-17."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return ConvBNAct(self.features, (1, 1), use_bias=self.use_bias,
                         act=nn.relu, dtype=self.dtype,
                         name="block")(x, train)


class DWSeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1, BN+ReLU after each.

    Reference: fusion_module.py:20-34.
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = ConvBNAct(in_ch, (3, 3), strides=self.strides, groups=in_ch,
                      act=nn.relu, dtype=self.dtype,
                      name="dw")(x, train)
        x = ConvBNAct(self.features, (1, 1), act=nn.relu, dtype=self.dtype,
                      name="pw")(x, train)
        return x
