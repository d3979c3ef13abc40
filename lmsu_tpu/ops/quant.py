"""Post-training int8 quantization for the serving path (w8a8 pointwise).

No reference analog (the reference serves fp32 eager torch); this is the
TPU-native "lightweight deployment" extension of the framework's serving
stack: v5e MXUs execute s8 x s8 -> s32 contractions at twice the bf16 rate.

MEASURED CLOSURE (real v5e, docs/quant_eval_v5e.json, scripts/
profile_quant_eval.py): the int8 path is SLOWER than bf16 on this model —
B=32 eval fwd 7.67 vs 5.16 ms (0.67x), B=1 1.41 vs 1.06 ms. Structural
reason: only the pointwise convs quantize while the surrounding tensors
(depthwise convs, BN, resizes) stay bf16, so no inter-layer HBM traffic is
saved — each quantized conv ADDS per-element round/clip/cast VPU work on
its full activation tensor — and the forward runs at 7.5% MFU
(memory/latency-bound), so the 2x int8 MXU rate buys nothing. A win would
need end-to-end int8 activation storage (requantizing epilogues, int8
residuals), a different project with real PTQ-accuracy risk. The path
stays as a correctness-complete opt-in (Predictor.quantize), not a
default.

Scheme (standard symmetric PTQ):
  * eligible ops: the 1x1 projection convolutions (models/layers.py
    ConvBNAct with kernel (1,1), groups=1) — they carry the model's matmul
    work. Depthwise/3x3 convs stay at compute_dtype (VPU ops; int8 buys
    no MXU there), as do the LiDAR per-point Dense MLP and the tiny
    2-channel classifier/attention heads.
  * weights: BatchNorm is folded into the kernel first (ops/ir_fused.py::
    fold_bn), then per-output-channel symmetric scales s_w = max|w| / 127.
  * activations: per-tensor symmetric scale s_x = absmax / 127, where
    absmax is recorded by a calibration pass (see inference.py::
    calibrate_quant) into the "quant_stats" variable collection.
  * compute: round/clip to int8, lax.dot_general with
    preferred_element_type=int32 (MXU-native), dequantize + bias + act in
    the f32 epilogue.

The quantized path is driven purely by the VARIABLES handed to apply():
no config plumbing — see ConvBNAct.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_QMAX = 127.0


def quantize_weights(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of a [Cin, Cout]
    (BN-folded) kernel. Returns (w_int8 [Cin, Cout], scales f32 [Cout])."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0) / _QMAX
    s = jnp.maximum(s, 1e-12)  # all-zero columns quantize to zeros
    wq = jnp.clip(jnp.round(w / s), -_QMAX, _QMAX).astype(jnp.int8)
    return wq, s


def quantize_acts(x: jnp.ndarray, absmax: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric int8 quantization with a calibrated absmax.
    Returns (x_int8, scale f32 scalar)."""
    s = jnp.maximum(absmax.astype(jnp.float32), 1e-12) / _QMAX
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -_QMAX, _QMAX
                  ).astype(jnp.int8)
    return xq, s


def int8_pointwise(x: jnp.ndarray, act_absmax: jnp.ndarray,
                   w_folded: jnp.ndarray, bias: jnp.ndarray,
                   out_dtype) -> jnp.ndarray:
    """Quantized 1x1 conv: x [..., Cin] @ w_folded [Cin, Cout] + bias.

    The round/clip/cast producer fuses into the consumer of x (so the
    int8 activation tensor is what XLA materializes), the s8 x s8 -> s32
    contraction rides the MXU, and dequant + bias fuse into its epilogue.
    """
    xq, s_x = quantize_acts(x, act_absmax)
    wq, s_w = quantize_weights(w_folded)
    y = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_x * s_w)
            + bias.astype(jnp.float32)).astype(out_dtype)
