"""Camera FPN, fusion variants, segmentation heads, and the complete model.

TPU-native rebuild of the reference fusion module (reference:
fusion_module.py).  NHWC throughout; every spatial resize is half-pixel
bilinear (ops/resize.py) matching the reference's align_corners=False.

Components and their reference counterparts:
  CameraFPNLite                  fusion_module.py:37-64
  ConcatenationFusion            fusion_module.py:70-91
  MinimalFusion                  fusion_module.py:94-104
  WeightedFusion                 fusion_module.py:107-136
  LightweightSegmentationHead    fusion_module.py:142-159   (x4 upsample)
  SameResolutionSegmentationHead fusion_module.py:162-173
  CompleteSegmentationModel      fusion_module.py:179-286

The forward exposes the intermediates dict {camera_feat, lidar_feat,
pre_fusion, post_fusion, logits} (fusion_module.py:260-262) — the KD feature
tap contract consumed by training/distill.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from lmsu_tpu.config import ModelConfig
from lmsu_tpu.models.camera_encoder import TwinLiteEncoder
from lmsu_tpu.models.layers import (Conv1x1Block, ConvBNAct, DWSeparableConv,
                                    conv_init)
from lmsu_tpu.models.lidar_encoder import LiDAREncoder
from lmsu_tpu.ops.resize import resize_bilinear


class ConvTranspose2dTorch(nn.Module):
    """2x-upsampling transposed conv with torch ConvTranspose2d semantics.

    Matches torch ConvTranspose2d(kernel=4, stride=2, padding=1): input is
    2x-dilated, padded by kernel-1-padding=2 per side, and correlated with the
    gradient-form kernel (lax transpose_kernel=True). Kernel param shape is
    [kh, kw, out_ch, in_ch] — torch's [in, out, kh, kw] transposed (2,3,1,0).
    """

    features: int
    kernel_size: Tuple[int, int] = (4, 4)
    strides: Tuple[int, int] = (2, 2)
    torch_padding: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", conv_init, (kh, kw, self.features, x.shape[-1]),
            jnp.float32)
        pad = ((kh - 1 - self.torch_padding,) * 2,
               (kw - 1 - self.torch_padding,) * 2)
        y = lax.conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype), self.strides, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class CameraFPNLite(nn.Module):
    """Sum of per-stage 1x1 laterals resized to the largest stage, then a
    depthwise-separable smoothing conv. Reference: fusion_module.py:37-64."""

    target_channels: int = 128
    stages_to_use: Optional[Tuple[str, ...]] = None
    target_size: Optional[Tuple[int, int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False
                 ) -> jnp.ndarray:
        stages = tuple(self.stages_to_use or feats.keys())
        if self.target_size is None:
            hw = max(((feats[s].shape[1], feats[s].shape[2]) for s in stages),
                     key=lambda x: x[0] * x[1])
        else:
            hw = self.target_size
        fused = None
        for s in stages:
            x = Conv1x1Block(self.target_channels, dtype=self.dtype,
                             name=f"lateral_{s}")(feats[s], train)
            x = resize_bilinear(x, hw)
            fused = x if fused is None else fused + x
        return DWSeparableConv(self.target_channels, dtype=self.dtype,
                               name="post")(fused, train)


class ConcatenationFusion(nn.Module):
    """1x1 per-modality projection, concat, DW3x3 + PW1x1 to out_channels.

    Reference: fusion_module.py:70-91. Returns (pre_fusion, fused) so the
    complete model can expose the KD taps without recomputing (the reference
    re-inlines the fusion internals for this, fusion_module.py:242-246).
    """

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cam_feat: jnp.ndarray, lidar_feat: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype)
        cam = Conv1x1Block(cam_feat.shape[-1], name="camera_proj",
                           **kw)(cam_feat, train)
        lid = Conv1x1Block(lidar_feat.shape[-1], name="lidar_proj",
                           **kw)(lidar_feat, train)
        pre = jnp.concatenate([cam, lid], axis=-1)
        in_cat = pre.shape[-1]
        y = ConvBNAct(in_cat, (3, 3), groups=in_cat, act=nn.relu,
                      name="fuse_dw", **kw)(pre, train)
        y = ConvBNAct(self.out_channels, (1, 1), act=nn.relu,
                      name="fuse_pw", **kw)(y, train)
        return pre, y


class MinimalFusion(nn.Module):
    """Elementwise-add fusion of 1x1-projected modalities.

    Reference: fusion_module.py:94-104.
    """

    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cam_feat: jnp.ndarray, lidar_feat: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype)
        cam = Conv1x1Block(self.out_channels, name="cam_proj", **kw)(cam_feat, train)
        lid = Conv1x1Block(self.out_channels, name="lidar_proj", **kw)(lidar_feat, train)
        fused = cam + lid
        return fused, fused


class WeightedFusion(nn.Module):
    """Per-pixel learned 2-way softmax gate over the two modalities.

    Reference: fusion_module.py:107-136. The gating math (concat -> 1x1 ->
    ReLU -> 1x1 -> softmax(2) -> weighted sum) is elementwise + 1x1 matmuls —
    set use_pallas to run it as one fused Pallas kernel on TPU
    (ops/fusion_pallas.py).
    """

    out_channels: int = 128
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cam_feat: jnp.ndarray, lidar_feat: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype)
        cam = Conv1x1Block(self.out_channels, name="cam_proj", **kw)(cam_feat, train)
        lid = Conv1x1Block(self.out_channels, name="lidar_proj", **kw)(lidar_feat, train)
        w1 = self.param("attn1_kernel", conv_init,
                        (1, 1, 2 * self.out_channels, self.out_channels),
                        jnp.float32)
        b1 = self.param("attn1_bias", nn.initializers.zeros,
                        (self.out_channels,), jnp.float32)
        w2 = self.param("attn2_kernel", conv_init,
                        (1, 1, self.out_channels, 2), jnp.float32)
        b2 = self.param("attn2_bias", nn.initializers.zeros, (2,), jnp.float32)
        if self.use_pallas:
            from lmsu_tpu.ops.fusion_pallas import weighted_fusion_gate
            fused = weighted_fusion_gate(cam, lid, w1, b1, w2, b2)
        else:
            concat = jnp.concatenate([cam, lid], axis=-1)
            h = nn.relu(jnp.einsum("bhwc,cd->bhwd",
                                   concat, w1[0, 0].astype(self.dtype))
                        + b1.astype(self.dtype))
            logits = jnp.einsum("bhwc,cd->bhwd",
                                h, w2[0, 0].astype(self.dtype)) + b2.astype(self.dtype)
            weights = jax.nn.softmax(logits, axis=-1)
            fused = cam * weights[..., 0:1] + lid * weights[..., 1:2]
        return fused, fused


class GatedSumFusion(nn.Module):
    """Non-convex gated sum: independent per-pixel sigmoid gates —
    fused = g_cam * cam + g_lid * lid.

    NO reference analog (the reference's fusions are concat / minimal /
    weighted only, fusion_module.py:70-136). Designed from the trained-gate
    ablation (docs/DESIGN.md "Why weighted fusion trails",
    docs/weighted_gate_analysis.json): WeightedFusion's softmax can only
    INTERPOLATE the two modalities per pixel — on the hard benchmark it
    degenerates into a LiDAR-occupancy switch — while the task rewards
    SUPERPOSITION (MinimalFusion's plain add wins the ablation).
    Independent sigmoid gates contain both regimes: (1, 1) recovers the
    add, (1, 0)/(0, 1) the mask, anything between a soft veto. Zero-init
    gate bias starts at g = (0.5, 0.5) = a scaled MinimalFusion, so
    training begins from the stronger family's behavior. Same gate-net
    parameter count as WeightedFusion; only the output normalization
    differs (sigmoid vs softmax).
    """

    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cam_feat: jnp.ndarray, lidar_feat: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype)
        cam = Conv1x1Block(self.out_channels, name="cam_proj", **kw)(cam_feat, train)
        lid = Conv1x1Block(self.out_channels, name="lidar_proj", **kw)(lidar_feat, train)
        w1 = self.param("attn1_kernel", conv_init,
                        (1, 1, 2 * self.out_channels, self.out_channels),
                        jnp.float32)
        b1 = self.param("attn1_bias", nn.initializers.zeros,
                        (self.out_channels,), jnp.float32)
        w2 = self.param("attn2_kernel", conv_init,
                        (1, 1, self.out_channels, 2), jnp.float32)
        b2 = self.param("attn2_bias", nn.initializers.zeros, (2,), jnp.float32)
        concat = jnp.concatenate([cam, lid], axis=-1)
        h = nn.relu(jnp.einsum("bhwc,cd->bhwd",
                               concat, w1[0, 0].astype(self.dtype))
                    + b1.astype(self.dtype))
        logits = jnp.einsum("bhwc,cd->bhwd",
                            h, w2[0, 0].astype(self.dtype)) + b2.astype(self.dtype)
        gates = jax.nn.sigmoid(logits)
        fused = cam * gates[..., 0:1] + lid * gates[..., 1:2]
        return fused, fused


class LightweightSegmentationHead(nn.Module):
    """Two ConvTranspose 2x upsamples (-> x4) + 3x3 classifier.

    Reference: fusion_module.py:142-159.
    """

    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, ch in enumerate((64, 16)):
            x = ConvTranspose2dTorch(ch, dtype=self.dtype,
                                     name=f"up{i + 1}_deconv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"up{i + 1}_bn")(x)
            x = nn.relu(x)
        return nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                       use_bias=True, kernel_init=conv_init,
                       dtype=self.dtype, name="cls")(x)


class SameResolutionSegmentationHead(nn.Module):
    """DWSep(in->64) -> DWSep(64->32) -> 1x1 classifier, resolution-preserving.

    Reference: fusion_module.py:162-173.
    """

    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype)
        x = DWSeparableConv(64, name="block1", **kw)(x, train)
        x = DWSeparableConv(32, name="block2", **kw)(x, train)
        return nn.Conv(self.num_classes, (1, 1), use_bias=True,
                       kernel_init=conv_init, dtype=self.dtype,
                       name="cls")(x)


class CompleteSegmentationModel(nn.Module):
    """Camera encoder (+FPN) + LiDAR encoder + fusion + head.

    Reference: fusion_module.py:179-286. `__call__(images, points)` returns
    logits [B, H, W, num_classes]; with return_intermediates=True also the KD
    tap dict. Inputs: images NHWC [B, 256, 256, 3], points [B, N, 4].
    """

    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, points: jnp.ndarray,
                 train: bool = False, return_intermediates: bool = False,
                 point_valid: Optional[jnp.ndarray] = None):
        cfg = self.config
        dtype = cfg.compute_dtype
        kw = dict(dtype=dtype)

        # uint8 images are accepted directly (4x cheaper host->device
        # transfer than fp32) and normalized on device — bit-identical to
        # the host-side /255 of the reference (pandaset_dataset.py:110).
        if images.dtype == jnp.uint8:
            images = images.astype(dtype) / jnp.asarray(255.0, dtype)
        camera = TwinLiteEncoder(cfg.camera, name="camera_encoder", **kw)
        cam_raw = camera(images.astype(dtype), train)
        if isinstance(cam_raw, dict):
            cam_feat = CameraFPNLite(
                target_channels=cfg.camera_fpn_channels,
                stages_to_use=cfg.camera_fpn_stages,
                name="camera_fpn", **kw)(cam_raw, train)
        else:
            cam_feat = cam_raw

        lidar_feat = LiDAREncoder(cfg.lidar, name="lidar_encoder",
                                  **kw)(points, train, point_valid)
        if cam_feat.shape[1:3] != lidar_feat.shape[1:3]:
            lidar_feat = resize_bilinear(lidar_feat, cam_feat.shape[1:3])

        # Non-concat fusions output at the camera-feature width — the FPN's
        # target channels in multiscale mode, else the raw encoder output
        # (reference: fusion_module.py:206-222 uses cam_feat_channels).
        cam_ch = cam_feat.shape[-1]
        if cfg.fusion_type == "concat":
            fusion = ConcatenationFusion(cfg.fusion_out_channels,
                                         name="fusion", **kw)
        elif cfg.fusion_type == "minimal":
            fusion = MinimalFusion(cam_ch, name="fusion", **kw)
        elif cfg.fusion_type == "weighted":
            fusion = WeightedFusion(cam_ch,
                                    use_pallas=cfg.use_pallas_fusion,
                                    name="fusion", **kw)
        elif cfg.fusion_type == "gated_sum":
            fusion = GatedSumFusion(cam_ch, name="fusion", **kw)
        else:
            raise ValueError(f"Unknown fusion_type: {cfg.fusion_type}")
        pre_fusion, fused = fusion(cam_feat, lidar_feat, train)

        if cfg.output_mode == "x4":
            head = LightweightSegmentationHead(cfg.num_classes,
                                               name="head", **kw)
        elif cfg.output_mode == "same":
            head = SameResolutionSegmentationHead(cfg.num_classes,
                                                  name="head", **kw)
        else:
            raise ValueError(f"Unknown output_mode: {cfg.output_mode}")
        logits = head(fused, train)

        if return_intermediates:
            return logits, {"camera_feat": cam_feat, "lidar_feat": lidar_feat,
                            "pre_fusion": pre_fusion, "post_fusion": fused,
                            "logits": logits}
        return logits
