"""Convert reference (PyTorch) checkpoints into lmsu_tpu flax variables.

Lets users of the reference repo load their trained `.pth` state dicts
directly into this framework, and powers the numerical-parity test suite
(tests/test_parity_torch.py): same weights in both frameworks must produce
bit-comparable 2-class predictions (argmax) and logits equal to float
tolerance.

Module-tree correspondence (reference file:line -> lmsu_tpu path):
  camera_encoder.stem.{0,1}                 camera_encoder.py:63-67   -> camera_encoder/stem
  camera_encoder.stageN.conv.*              camera_encoder.py:9-51    -> camera_encoder/stageN/{expand,depthwise,project}
  camera_fpn.laterals.<s>.conv.{0,1}        fusion_module.py:44-47    -> camera_fpn/lateral_<s>/block
  camera_fpn.post.net.*                     fusion_module.py:48       -> camera_fpn/post/{dw,pw}
  lidar_encoder.encoder.point_mlp.{0,1,3,4,6,7}  lidar_encoder.py:25-35 -> lidar_encoder/encoder/{mlp,bn}{0,1,2}
  fusion.* (per variant)                    fusion_module.py:70-136   -> fusion/*
  head.* (per output mode)                  fusion_module.py:142-173  -> head/*

Array-layout conversions (torch -> flax):
  Conv2d  [O,I,kh,kw]        -> [kh,kw,I,O]
  Depthwise Conv2d [C,1,k,k] -> [k,k,1,C]
  Conv1d(k=1) [O,I,1]        -> Dense [I,O]
  ConvTranspose2d [I,O,k,k]  -> [k,k,O,I]  (see models/fusion.py ConvTranspose2dTorch)
  BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from lmsu_tpu.config import ModelConfig


def _np(t) -> np.ndarray:
    """torch tensor (or array-like) -> numpy float32/raw array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv2d(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _conv1d_to_dense(w) -> np.ndarray:
    return _np(w)[:, :, 0].T


def _deconv2d(w) -> np.ndarray:
    # torch [in, out, kh, kw] -> ConvTranspose2dTorch kernel [kh, kw, out, in]
    return _np(w).transpose(2, 3, 1, 0)


class _TreeBuilder:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}

    @staticmethod
    def _set(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, sd, tkey, path, bias=False, transform=_conv2d):
        self._set(self.params, path + ("kernel",), transform(sd[f"{tkey}.weight"]))
        if bias:
            self._set(self.params, path + ("bias",), _np(sd[f"{tkey}.bias"]))

    def dense(self, sd, tkey, path):
        self._set(self.params, path + ("kernel",), _conv1d_to_dense(sd[f"{tkey}.weight"]))
        self._set(self.params, path + ("bias",), _np(sd[f"{tkey}.bias"]))

    def bn(self, sd, tkey, path):
        self._set(self.params, path + ("scale",), _np(sd[f"{tkey}.weight"]))
        self._set(self.params, path + ("bias",), _np(sd[f"{tkey}.bias"]))
        self._set(self.batch_stats, path + ("mean",), _np(sd[f"{tkey}.running_mean"]))
        self._set(self.batch_stats, path + ("var",), _np(sd[f"{tkey}.running_var"]))

    def conv_bn(self, sd, tconv, tbn, path):
        """A torch Conv+BN pair -> one ConvBNAct module {conv, bn}."""
        self.conv(sd, tconv, path + ("conv",))
        self.bn(sd, tbn, path + ("bn",))


def _inverted_residual(b: _TreeBuilder, sd, tkey: str, path: Tuple[str, ...],
                       expansion: int) -> None:
    """Reference InvertedResidual Sequential indices (camera_encoder.py:19-44):
    expansion!=1: [0 pw-conv, 1 bn, 2 act, 3 dw-conv, 4 bn, 5 act, 6 pw, 7 bn]
    expansion==1: [0 dw-conv, 1 bn, 2 act, 3 pw, 4 bn]
    """
    if expansion != 1:
        b.conv_bn(sd, f"{tkey}.conv.0", f"{tkey}.conv.1", path + ("expand",))
        b.conv_bn(sd, f"{tkey}.conv.3", f"{tkey}.conv.4", path + ("depthwise",))
        b.conv_bn(sd, f"{tkey}.conv.6", f"{tkey}.conv.7", path + ("project",))
    else:
        b.conv_bn(sd, f"{tkey}.conv.0", f"{tkey}.conv.1", path + ("depthwise",))
        b.conv_bn(sd, f"{tkey}.conv.3", f"{tkey}.conv.4", path + ("project",))


def _dwsep(b: _TreeBuilder, sd, tkey: str, path: Tuple[str, ...]) -> None:
    """Reference DWSeparableConv .net indices (fusion_module.py:24-32)."""
    b.conv_bn(sd, f"{tkey}.net.0", f"{tkey}.net.1", path + ("dw",))
    b.conv_bn(sd, f"{tkey}.net.3", f"{tkey}.net.4", path + ("pw",))


def _conv1x1_block(b: _TreeBuilder, sd, tkey: str, path: Tuple[str, ...]) -> None:
    """Reference Conv1x1 .conv indices (fusion_module.py:11-15)."""
    b.conv_bn(sd, f"{tkey}.conv.0", f"{tkey}.conv.1", path + ("block",))


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    config: ModelConfig,
) -> Dict[str, Any]:
    """Reference CompleteSegmentationModel state_dict -> flax variables dict."""
    sd = state_dict
    b = _TreeBuilder()

    # Camera encoder
    b.conv_bn(sd, "camera_encoder.stem.0", "camera_encoder.stem.1",
              ("camera_encoder", "stem"))
    for stage, exp in [("stage1", 1), ("stage2", 6), ("stage3", 6),
                       ("stage4", 6), ("stage5", 6)]:
        _inverted_residual(b, sd, f"camera_encoder.{stage}",
                           ("camera_encoder", stage), exp)

    # Camera FPN
    stages = config.camera_fpn_stages or ("stage2", "stage3", "stage4", "stage5")
    if config.camera.return_multiscale:
        for s in stages:
            _conv1x1_block(b, sd, f"camera_fpn.laterals.{s}",
                           ("camera_fpn", f"lateral_{s}"))
        _dwsep(b, sd, "camera_fpn.post", ("camera_fpn", "post"))

    # LiDAR point MLP: Sequential [0 conv,1 bn,2 relu,3 conv,4 bn,5 relu,6 conv,7 bn,8 relu]
    for i, idx in enumerate((0, 3, 6)):
        b.dense(sd, f"lidar_encoder.encoder.point_mlp.{idx}",
                ("lidar_encoder", "encoder", f"mlp{i}"))
        b.bn(sd, f"lidar_encoder.encoder.point_mlp.{idx + 1}",
             ("lidar_encoder", "encoder", f"bn{i}"))

    # Fusion
    if config.fusion_type == "concat":
        _conv1x1_block(b, sd, "fusion.camera_proj", ("fusion", "camera_proj"))
        _conv1x1_block(b, sd, "fusion.lidar_proj", ("fusion", "lidar_proj"))
        b.conv_bn(sd, "fusion.fuse.0", "fusion.fuse.1", ("fusion", "fuse_dw"))
        b.conv_bn(sd, "fusion.fuse.3", "fusion.fuse.4", ("fusion", "fuse_pw"))
    else:
        _conv1x1_block(b, sd, "fusion.cam_proj", ("fusion", "cam_proj"))
        _conv1x1_block(b, sd, "fusion.lidar_proj", ("fusion", "lidar_proj"))
        if config.fusion_type == "weighted":
            b._set(b.params, ("fusion", "attn1_kernel"),
                   _conv2d(sd["fusion.attention.0.weight"]))
            b._set(b.params, ("fusion", "attn1_bias"),
                   _np(sd["fusion.attention.0.bias"]))
            b._set(b.params, ("fusion", "attn2_kernel"),
                   _conv2d(sd["fusion.attention.2.weight"]))
            b._set(b.params, ("fusion", "attn2_bias"),
                   _np(sd["fusion.attention.2.bias"]))

    # Head
    if config.output_mode == "same":
        _dwsep(b, sd, "head.block.0", ("head", "block1"))
        _dwsep(b, sd, "head.block.1", ("head", "block2"))
        b.conv(sd, "head.cls", ("head", "cls"), bias=True)
    else:  # x4
        for i in (1, 2):
            b.conv(sd, f"head.up{i}.0", ("head", f"up{i}_deconv"),
                   transform=_deconv2d)
            b.bn(sd, f"head.up{i}.1", ("head", f"up{i}_bn"))
        b.conv(sd, "head.cls", ("head", "cls"), bias=True)

    import jax.numpy as jnp
    to_jnp = lambda tree: {
        k: to_jnp(v) if isinstance(v, dict) else jnp.asarray(v, jnp.float32)
        for k, v in tree.items()}
    return {"params": to_jnp(b.params), "batch_stats": to_jnp(b.batch_stats)}


def load_torch_checkpoint(path: str, config: ModelConfig) -> Dict[str, Any]:
    """Load a reference trainer checkpoint (.pth with 'model_state',
    trainer.py:116-129) into flax variables. Requires torch on the host."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt)
    return convert_torch_state_dict(sd, config)
