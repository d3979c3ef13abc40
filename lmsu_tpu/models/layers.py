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
    """Conv2D + BatchNorm + optional activation.

    Serving-side int8 (w8a8) quantization, 1x1/groups=1 convs only, is
    driven purely by the VARIABLES handed to apply() — no config plumbing
    (ops/quant.py has the scheme; inference.py::calibrate_quant the entry
    point):

      * plain variables ........................ exactly the normal path;
      * eval apply with mutable=["quant_stats"] . calibration: normal math
        plus a per-instance running absmax of the input activation;
      * variables CONTAINING "quant_stats" ...... int8 path: BN folded into
        the kernel, per-Cout weight scales, per-tensor activation scale
        from the calibrated absmax, s8 x s8 -> s32 MXU contraction.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    act: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = relu6
    dtype: Any = jnp.float32

    def _int8_call(self, x: jnp.ndarray) -> jnp.ndarray:
        from lmsu_tpu.ops.ir_fused import fold_bn
        from lmsu_tpu.ops.quant import int8_pointwise
        p = self.variables["params"]
        st = self.variables["batch_stats"]
        scale, bias = fold_bn(p["bn"]["scale"], p["bn"]["bias"],
                              st["bn"]["mean"], st["bn"]["var"], 1e-5)
        if self.use_bias:
            bias = bias + p["conv"]["bias"] * scale
        w_folded = (p["conv"]["kernel"][0, 0].astype(jnp.float32)
                    * scale[None, :].astype(jnp.float32))
        absmax = self.get_variable("quant_stats", "act_absmax")
        y = int8_pointwise(x, absmax, w_folded, bias, self.dtype)
        return self.act(y) if self.act is not None else y

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        quant_ok = (self.kernel_size == (1, 1) and self.groups == 1
                    and not train and not self.is_initializing())
        if quant_ok and self.is_mutable_collection("quant_stats"):
            stat = self.variable("quant_stats", "act_absmax",
                                 lambda: jnp.zeros((), jnp.float32))
            stat.value = jnp.maximum(
                stat.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
        elif quant_ok and self.has_variable("quant_stats", "act_absmax"):
            return self._int8_call(x)
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

    fused_inference: eval-mode calls run the whole block as one Pallas
    kernel (ops/ir_fused.py) with BN folded — the expanded hidden tensor
    stays in VMEM. Param layout is unchanged (the kernel reads this
    module's own variables), so checkpoints are interchangeable.
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    expansion_ratio: int = 6
    dtype: Any = jnp.float32
    fused_inference: bool = False
    fused_train: bool = False

    def _fused_train_call(self, x: jnp.ndarray) -> jnp.ndarray:
        """Training forward through the fused Pallas kernels
        (ops/ir_fused.py): reads this module's own variables, runs the
        custom-VJP block, and writes the BN running-average updates back
        into the children's batch_stats subtrees (identical layout to the
        unfused path, so checkpoints are interchangeable)."""
        from lmsu_tpu.ops.ir_fused import fused_ir_train
        p = self.variables["params"]
        st = self.variables["batch_stats"]
        has_expand = "expand" in p
        Ce = p["depthwise"]["conv"]["kernel"].shape[-1]
        if has_expand:
            w1 = p["expand"]["conv"]["kernel"][0, 0]
            g1 = p["expand"]["bn"]["scale"]
            be1 = p["expand"]["bn"]["bias"]
        else:
            w1 = jnp.zeros((x.shape[-1], Ce))
            g1 = jnp.zeros((Ce,))
            be1 = jnp.zeros((Ce,))
        out, (m1, v1, m2, v2, m3, v3) = fused_ir_train(
            x.astype(self.dtype), w1, g1, be1,
            p["depthwise"]["conv"]["kernel"][:, :, 0, :],
            p["depthwise"]["bn"]["scale"], p["depthwise"]["bn"]["bias"],
            p["project"]["conv"]["kernel"][0, 0],
            p["project"]["bn"]["scale"], p["project"]["bn"]["bias"],
            self.strides[0], has_expand, 1e-5)
        if self.is_mutable_collection("batch_stats"):
            mom = 0.9  # flax momentum 0.9 == torch 0.1 (layers docstring)

            def ema(name, m, v):
                old = st[name]["bn"]
                self.put_variable("batch_stats", name, {"bn": {
                    "mean": mom * old["mean"] + (1 - mom) * m,
                    "var": mom * old["var"] + (1 - mom) * v}})
            if has_expand:
                ema("expand", m1, v1)
            ema("depthwise", m2, v2)
            ema("project", m3, v3)
        return out

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expansion_ratio))
        use_residual = self.strides == (1, 1) and in_ch == self.features
        if (self.fused_inference and not train
                and not self.is_initializing()):
            from lmsu_tpu.ops.ir_fused import (fused_ir_infer,
                                               params_from_variables)
            p = params_from_variables(
                {"params": self.variables["params"],
                 "batch_stats": self.variables["batch_stats"]})
            return fused_ir_infer(x.astype(self.dtype), p,
                                  stride=self.strides[0])
        if self.fused_train and train and not self.is_initializing():
            return self._fused_train_call(x)
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
