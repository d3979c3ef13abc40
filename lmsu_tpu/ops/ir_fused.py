"""Pallas TPU kernels: fused InvertedResidual blocks.

Why: the camera encoder dominates the train step (16.5 ms of ~40 at B=32)
and is HBM-bound at ~100% of the roofline *for the traffic XLA schedules*
(scripts/profile_roofline.py). The cause is structural: TPU convolution
HLOs cannot fuse their producers, so every ConvBNAct materializes both the
conv output and the BN+act output — for the 6x-expanded hidden tensors
that is 201 MB per materialization at B=32 (ROADMAP round-2 notes). These
kernels keep the whole expand -> depthwise -> project chain of one
InvertedResidual (reference: camera_encoder.py:9-51) in VMEM per batch
element, so the expanded activations (mostly) never touch HBM.

Structure: every kernel runs with grid (B,) over ONE channel chunk of the
expanded hidden dimension; the wrapper loops over chunks as separate
pallas_calls and combines the (small) partial results in XLA. Chunk policy
(_hidden_chunk/_pad_to_lanes): hidden dims >= 128 are zero-padded to a
multiple of 128 lanes and split into 128-wide chunks, so every vector op
runs at full lane width and every reshape is lane-aligned; narrower
hidden dims stay whole (satisfying the Mosaic block constraint that lane
dims be 128-multiples OR the full array dim).

Inference mode (`fused_ir_infer`): BN running stats fold into per-channel
scale/bias, so one pass per chunk:

    e   = x @ W1[:, blk]                 (MXU, f32 accumulate)
    e'  = relu6(e * s1 + b1)             (folded BN1)
    d   = dw3x3(e', stride)              (9 shifted VPU MACs, f32 acc;
                                          stride-2 subsamples per tap)
    d'  = relu6(d * s2 + b2)             (folded BN2)
    y_k = d' @ W2[blk, :]                (MXU)
  glue: out = (sum_k y_k) * s3 + b3 (+ x if residual)

Training mode (`fused_ir_train`, custom VJP): BatchNorm needs global batch
statistics BEFORE normalizing, so the forward is three kernel passes with
[C]-vector XLA glue between them:

    K1 stats1:    e = x@W1 recomputed, never stored -> mean1/var1
    K2 expand+dw: recompute e, fold-BN1+relu6, depthwise; STORE d (the one
                  tensor too expensive to recompute); stats -> mean2/var2
    K3 project:   fold-BN2+relu6, y_k = d'@W2[blk]; y = sum_k (XLA)
    glue:         stats3 from y; out = BN3(y) (+ x)

The backward saves (x, d, y, stats) and recomputes the matmul-cheap rest:

    glue: BN3 backward over the small y/dout pair -> dy, dgamma3, dbeta3
    K4 proj_bwd:  dW2 += d'^T dy; dv2 = relu6'(v2).(dy W2^T); STORE dv2;
                  BN2-backward sums
    K5 dw_bwd:    dd = BN2bwd(dv2) (vectors from glue); dilate if stride 2;
                  dDW[t] += sum e'.shift(dd_up); de' = conv_T(dd_up, DW);
                  dv1 = relu6'(v1).de' (e' recomputed from x); STORE dv1;
                  BN1-backward sums
    K6 expand_bwd: de = BN1bwd(dv1); dW1 += x^T de; dx_k = de W1[blk]^T
                  (partials summed in XLA, + dout if residual)

Numerics match the unfused flax path: matmuls/convs accumulate f32 over
bf16-rounded operands (= XLA conv behavior), statistics are f32 over the
bf16-rounded conv outputs (= flax _compute_stats with use_fast_variance),
BN backward is the standard two-reduction formula that autodiff derives
from flax's normalize. Equivalence + gradient tests:
tests/test_ir_fused.py (CPU interpret exact in fp32; TPU tolerance bf16).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    """BN(stats) == x * scale + bias. rsqrt to match flax's normalize
    exactly (used for both running-stats inference folding and batch-stats
    training folding)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale


def _bn_stats_finalize(s, sq, m_count):
    """flax _compute_stats (use_fast_variance): biased var = E[x^2]-E[x]^2."""
    mean = s / m_count
    var = sq / m_count - mean * mean
    return mean, var


_fold_batch = fold_bn


def _hidden_chunk(ce: int) -> int:
    """Chunk of the (lane-padded) hidden dim: 128 keeps every vector op at
    full lane width and every reshape lane-aligned."""
    return 128 if ce % 128 == 0 else ce


def _pad_to_lanes(ce: int) -> int:
    """Hidden dims are zero-padded to a multiple of 128 lanes (when >=128)
    so chunks are exactly 128 wide. Padded channels stay exactly zero
    through BN/relu6/dw/project and contribute nothing to outputs or
    gradients (their gamma/weights are zero-padded)."""
    if ce < 128:
        return ce
    return ((ce + 127) // 128) * 128


def _subsample2(a, Ho: int, Wo: int, c: int):
    """[2Ho, 2Wo, c] -> even rows/cols [Ho, Wo, c]. Rows split on the
    outer dim (free); columns via the lane-merge trick ([2Wo, c] ->
    [Wo, 2c] is linear-order preserving, and the [:c] slice is
    lane-aligned when c % 128 == 0)."""
    a = a.reshape(Ho, 2, 2 * Wo, c)[:, 0]
    if c % 128 == 0:
        return a.reshape(Ho, Wo, 2 * c)[:, :, :c]
    return a.reshape(Ho, Wo, 2, c)[:, :, 0]  # interpret/small-c fallback


def _dw3x3(e_act, dw_tap, H: int, W: int, stride: int):
    """Depthwise 3x3, padding 1, on a [H, W, c] VMEM tile; f32 result.
    For stride 2 each tap's window is subsampled BEFORE the MAC so the
    accumulator is output-sized."""
    c = e_act.shape[-1]
    ep = jnp.pad(e_act, ((1, 1), (1, 1), (0, 0)))
    Ho, Wo = H // stride, W // stride
    acc = jnp.zeros((Ho, Wo, c), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = ep[ky:ky + H, kx:kx + W, :]
            if stride == 2:
                sl = _subsample2(sl, Ho, Wo, c)
            acc = acc + sl.astype(jnp.float32) * dw_tap[ky, kx][None, None, :]
    return acc


def _dw3x3_flip(g, dw_tap, H, W):
    """conv_transpose core: correlation with the 180-degree-rotated kernel
    (static tap indexing — Mosaic has no negative-stride slicing)."""
    c = g.shape[-1]
    gp = jnp.pad(g, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((H, W, c), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = gp[ky:ky + H, kx:kx + W, :]
            acc = acc + sl.astype(jnp.float32) * \
                dw_tap[2 - ky, 2 - kx][None, None, :]
    return acc


def _dilate2(dd, Ho, Wo, c):
    """[Ho, Wo, c] -> [2Ho, 2Wo, c] zero-interleaved (stride-2 transpose).
    Columns via the lane-merge trick (concat on the lane dim, then a
    linear-order-preserving reshape); rows on the outer dim (free)."""
    if c % 128 == 0:
        w = jnp.concatenate([dd, jnp.zeros_like(dd)],
                            axis=-1).reshape(Ho, 2 * Wo, c)
    else:  # interpret/small-c fallback
        w = jnp.stack([dd, jnp.zeros_like(dd)],
                      axis=2).reshape(Ho, 2 * Wo, c)
    return jnp.concatenate([w[:, None], jnp.zeros_like(w)[:, None]],
                           axis=1).reshape(2 * Ho, 2 * Wo, c)


def _interpret():
    return jax.default_backend() == "cpu"


def _check_spatial(H: int, W: int, stride: int) -> None:
    """The stride-2 subsample/dilate tricks assume even H/W (true for the
    256^2 default: every stage sees a power-of-two size). The unfused flax
    path handles odd dims (SAME-style ceil outputs) — fail loudly rather
    than produce a confusing Mosaic reshape error."""
    if stride == 2 and (H % 2 or W % 2):
        raise ValueError(
            f"fused InvertedResidual needs even spatial dims at stride-2 "
            f"stages, got {H}x{W}; use the unfused path "
            f"(CameraEncoderConfig.fused_inference/fused_train=False) for "
            f"image sizes not divisible by 16.")


def _check_channels(cblk: int, stride: int) -> None:
    """The stride-2 column tricks (_subsample2/_dilate2) need a 128-lane-
    aligned chunk on real TPUs; the c%128!=0 fallback splits the sublane
    dim, which Mosaic may not lower. True for the default widths (hidden
    192/384/768 pad to 128-multiples); narrow width_mults hit this at the
    downsampling stages — fail loudly, interpret mode (CPU tests) is fine."""
    if stride == 2 and cblk % 128 and not _interpret():
        raise ValueError(
            f"fused InvertedResidual on TPU needs a 128-multiple hidden "
            f"width at stride-2 stages (chunk width {cblk}); use the "
            f"unfused path for narrow width_mult configs.")


# Mosaic's default scoped-VMEM limit is too small for these kernels:
# the training backward (_dw_bwd_kernel) keeps ~14 full spatial planes
# live at once, each lane-padded to 128 channels (112 MB measured for a
# 128x128 stage at the default cap's 96 MB scoped limit), so raise the
# per-kernel cap toward v5e's 128 MB physical VMEM. The 128-lane chunk
# policy (_hidden_chunk/_pad_to_lanes) bounds per-plane size.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=120 << 20)


def _vspec(shape):
    return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _bspec(shape):
    """Batch-blocked: block (1, *shape[1:]) at (b, 0, ...)."""
    n = len(shape)
    return pl.BlockSpec((1,) + shape[1:],
                        lambda b: (b,) + tuple(0 for _ in range(n - 1)),
                        memory_space=pltpu.VMEM)


# -- inference ---------------------------------------------------------------


def _ir_infer_kernel(x_ref, w1_ref, s1_ref, b1_ref, dw_ref, s2_ref, b2_ref,
                     w2_ref, y_ref, *, H, W, stride, has_expand):
    x = x_ref[0]
    cin = x.shape[-1]
    if has_expand:
        e = jnp.dot(x.reshape(H * W, cin), w1_ref[:],
                    preferred_element_type=jnp.float32)
        e = _relu6(e * s1_ref[0][None, :] + b1_ref[0][None, :])
        e_act = e.astype(x.dtype).reshape(H, W, e.shape[-1])
    else:
        e_act = x
    d = _dw3x3(e_act, dw_ref[:].astype(x.dtype).astype(jnp.float32),
               H, W, stride)
    d = _relu6(d * s2_ref[0][None, None, :] + b2_ref[0][None, None, :])
    c = d.shape[-1]
    Ho, Wo = H // stride, W // stride
    y = jnp.dot(d.astype(x.dtype).reshape(Ho * Wo, c), w2_ref[:],
                preferred_element_type=jnp.float32)
    y_ref[0] = y.reshape(Ho, Wo, y.shape[-1])


class IRParams(NamedTuple):
    """Folded per-block parameters (see params_from_variables)."""
    w1: Optional[jnp.ndarray]
    s1: Optional[jnp.ndarray]
    b1: Optional[jnp.ndarray]
    dw: jnp.ndarray
    s2: jnp.ndarray
    b2: jnp.ndarray
    w2: jnp.ndarray
    s3: jnp.ndarray
    b3: jnp.ndarray


def params_from_variables(variables: Dict[str, Any], eps: float = 1e-5
                          ) -> IRParams:
    """Fold one InvertedResidual module's {params, batch_stats} (flax
    layout: expand/depthwise/project ConvBNAct children) into IRParams."""
    p = variables["params"]
    st = variables["batch_stats"]

    def fold(name):
        bn_p, bn_s = p[name]["bn"], st[name]["bn"]
        return fold_bn(bn_p["scale"], bn_p["bias"], bn_s["mean"],
                       bn_s["var"], eps)

    has_expand = "expand" in p
    if has_expand:
        w1 = p["expand"]["conv"]["kernel"][0, 0]          # [Cin, Ce]
        s1, b1 = fold("expand")
    else:
        w1 = s1 = b1 = None
    dw = p["depthwise"]["conv"]["kernel"][:, :, 0, :]     # [3, 3, Ce]
    s2, b2 = fold("depthwise")
    w2 = p["project"]["conv"]["kernel"][0, 0]             # [Ce, Cout]
    s3, b3 = fold("project")
    return IRParams(w1, s1, b1, dw, s2, b2, w2, s3, b3)


def fused_ir_infer(x: jnp.ndarray, p: IRParams, *, stride: int = 1
                   ) -> jnp.ndarray:
    """Fused inference InvertedResidual. x: [B,H,W,Cin] -> [B,Ho,Wo,Cout].

    Matches the unfused eval-mode flax block (reference:
    camera_encoder.py:9-51 — residual iff stride==1 and Cin==Cout).
    """
    B, H, W, Cin = x.shape
    has_expand = p.w1 is not None
    Ce = p.dw.shape[-1]
    Cout = p.w2.shape[-1]
    residual = stride == 1 and Cin == Cout
    _check_spatial(H, W, stride)
    Ho, Wo = H // stride, W // stride
    if not has_expand and Ce != Cin:
        raise ValueError("expansion-1 block must have Ce == Cin")

    Cep = Ce if not has_expand else _pad_to_lanes(Ce)
    cblk = Ce if not has_expand else _hidden_chunk(Cep)
    _check_channels(cblk, stride)
    padc = Cep - Ce
    if padc:
        p = IRParams(jnp.pad(p.w1, ((0, 0), (0, padc))),
                     jnp.pad(p.s1, (0, padc)), jnp.pad(p.b1, (0, padc)),
                     jnp.pad(p.dw, ((0, 0), (0, 0), (0, padc))),
                     jnp.pad(p.s2, (0, padc)), jnp.pad(p.b2, (0, padc)),
                     jnp.pad(p.w2, ((0, padc), (0, 0))), p.s3, p.b3)
    dt = x.dtype
    f32 = jnp.float32
    dw = p.dw.astype(f32)
    interp = _interpret()

    def chunk_call(k0):
        k1 = k0 + cblk
        w1 = (p.w1[:, k0:k1] if has_expand else jnp.zeros((Cin, cblk))
              ).astype(dt)
        s1 = (p.s1[k0:k1] if has_expand else jnp.zeros((cblk,))
              ).astype(f32)[None]
        b1 = (p.b1[k0:k1] if has_expand else jnp.zeros((cblk,))
              ).astype(f32)[None]
        return pl.pallas_call(
            functools.partial(_ir_infer_kernel, H=H, W=W, stride=stride,
                              has_expand=has_expand),
            grid=(B,),
            in_specs=[_bspec((B, H, W, Cin)), _vspec((Cin, cblk)),
                      _vspec((1, cblk)), _vspec((1, cblk)),
                      _vspec((3, 3, cblk)), _vspec((1, cblk)),
                      _vspec((1, cblk)), _vspec((cblk, Cout))],
            out_specs=_bspec((B, Ho, Wo, Cout)),
            out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), f32),
            interpret=interp,
            compiler_params=_COMPILER_PARAMS,
        )(x, w1, s1, b1, dw[:, :, k0:k1], p.s2.astype(f32)[None, k0:k1],
          p.b2.astype(f32)[None, k0:k1], p.w2[k0:k1].astype(dt))

    y = chunk_call(0)
    for k0 in range(cblk, Cep, cblk):
        y = y + chunk_call(k0)
    out = (y * p.s3.astype(f32)[None, None, None, :]
           + p.b3.astype(f32)[None, None, None, :]).astype(dt)
    if residual:
        out = x + out
    return out


# -- training kernels --------------------------------------------------------
# Cross-batch accumulators ([C]-vector sums, dW blocks) live in f32 VMEM
# scratch: zeroed at b==0, written to the output at b==B-1.


def _expand_chunk(x, w1_ref, s1_ref, b1_ref, H, W):
    """Recompute e (bf16-rounded), v1 (f32), e_act for one chunk."""
    e = jnp.dot(x.reshape(H * W, x.shape[-1]), w1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    e32 = e.astype(jnp.float32)
    v1 = e32 * s1_ref[0][None, :] + b1_ref[0][None, :]
    e_act = _relu6(v1).astype(x.dtype).reshape(H, W, v1.shape[-1])
    return e32, v1, e_act


def _stats1_kernel(x_ref, w1_ref, sum_ref, sq_ref, ssum, ssq, *, H, W):
    b = pl.program_id(0)
    B = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        ssum[:] = jnp.zeros_like(ssum)
        ssq[:] = jnp.zeros_like(ssq)

    x = x_ref[0]
    e = jnp.dot(x.reshape(H * W, x.shape[-1]), w1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    e32 = e.astype(jnp.float32)
    ssum[0, :] += jnp.sum(e32, axis=0)
    ssq[0, :] += jnp.sum(e32 * e32, axis=0)

    @pl.when(b == B - 1)
    def _():
        sum_ref[:] = ssum[:]
        sq_ref[:] = ssq[:]


def _expand_dw_kernel(x_ref, w1_ref, s1_ref, b1_ref, dw_ref, d_ref,
                      sum_ref, sq_ref, ssum, ssq, *,
                      H, W, stride, has_expand):
    b = pl.program_id(0)
    B = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        ssum[:] = jnp.zeros_like(ssum)
        ssq[:] = jnp.zeros_like(ssq)

    x = x_ref[0]
    if has_expand:
        _, _, e_act = _expand_chunk(x, w1_ref, s1_ref, b1_ref, H, W)
    else:
        e_act = x
    d = _dw3x3(e_act, dw_ref[:].astype(x.dtype).astype(jnp.float32),
               H, W, stride)
    d_bf = d.astype(d_ref.dtype)
    d_ref[0] = d_bf
    d32 = d_bf.astype(jnp.float32)
    ssum[0, :] += jnp.sum(d32, axis=(0, 1))
    ssq[0, :] += jnp.sum(d32 * d32, axis=(0, 1))

    @pl.when(b == B - 1)
    def _():
        sum_ref[:] = ssum[:]
        sq_ref[:] = ssq[:]


def _proj_kernel(d_ref, s2_ref, b2_ref, w2_ref, y_ref, *, Ho, Wo):
    d = d_ref[0]
    c = d.shape[-1]
    v2 = d.astype(jnp.float32).reshape(Ho * Wo, c) * s2_ref[0][None, :] \
        + b2_ref[0][None, :]
    d_act = _relu6(v2).astype(d.dtype)
    y = jnp.dot(d_act, w2_ref[:], preferred_element_type=jnp.float32)
    y_ref[0] = y.reshape(Ho, Wo, y.shape[-1])


def _proj_bwd_kernel(d_ref, dy_ref, s2_ref, b2_ref, m2_ref, i2_ref, w2_ref,
                     dv2_ref, dw2_ref, ra_ref, rb_ref, sdw2, sa, sb, *,
                     Ho, Wo):
    b = pl.program_id(0)
    B = pl.num_programs(0)
    c = d_ref.shape[-1]

    @pl.when(b == 0)
    def _():
        sdw2[:] = jnp.zeros_like(sdw2)
        sa[:] = jnp.zeros_like(sa)
        sb[:] = jnp.zeros_like(sb)

    d = d_ref[0].reshape(Ho * Wo, c)
    dy = dy_ref[0].reshape(Ho * Wo, dy_ref.shape[-1])
    d32 = d.astype(jnp.float32)
    dn = (d32 - m2_ref[0][None, :]) * i2_ref[0][None, :]
    v2 = d32 * s2_ref[0][None, :] + b2_ref[0][None, :]
    d_act = _relu6(v2).astype(d.dtype)
    sdw2[:] += jax.lax.dot_general(
        d_act, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dd_hat = jax.lax.dot_general(
        dy, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    mask = ((v2 > 0.0) & (v2 < 6.0)).astype(jnp.float32)
    dv2 = dd_hat * mask
    dv2_ref[0] = dv2.astype(dv2_ref.dtype).reshape(Ho, Wo, c)
    sa[0, :] += jnp.sum(dv2, axis=0)
    sb[0, :] += jnp.sum(dv2 * dn, axis=0)

    @pl.when(b == B - 1)
    def _():
        dw2_ref[:] = sdw2[:]
        ra_ref[:] = sa[:]
        rb_ref[:] = sb[:]


def _dw_bwd_kernel(x_ref, w1_ref, s1_ref, b1_ref, m1_ref, i1_ref, dw_ref,
                   dv2_ref, u2_ref, p2_ref, q2_ref, d_ref, m2_ref, i2_ref,
                   dv1_ref, ddw_ref, ra_ref, rb_ref, sdw, sa, sb, *,
                   H, W, stride, has_expand):
    b = pl.program_id(0)
    B = pl.num_programs(0)
    Ho, Wo = H // stride, W // stride
    c = d_ref.shape[-1]

    @pl.when(b == 0)
    def _():
        sdw[:] = jnp.zeros_like(sdw)
        sa[:] = jnp.zeros_like(sa)
        sb[:] = jnp.zeros_like(sb)

    x = x_ref[0]
    if has_expand:
        e32, v1, e_act = _expand_chunk(x, w1_ref, s1_ref, b1_ref, H, W)
    else:
        e_act = x
        e32 = v1 = None
    d32 = d_ref[0].astype(jnp.float32)
    dn = (d32 - m2_ref[0][None, None, :]) * i2_ref[0][None, None, :]
    dv2 = dv2_ref[0].astype(jnp.float32)
    dd = u2_ref[0][None, None, :] * dv2 - p2_ref[0][None, None, :] \
        - q2_ref[0][None, None, :] * dn
    if stride == 2:
        dd_up = _dilate2(dd.astype(x.dtype), Ho, Wo, c)
    else:
        dd_up = dd.astype(x.dtype)
    ep = jnp.pad(e_act, ((1, 1), (1, 1), (0, 0)))
    dd32 = dd_up.astype(jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = ep[ky:ky + H, kx:kx + W, :].astype(jnp.float32)
            sdw[ky * 3 + kx, :] += jnp.sum(sl * dd32, axis=(0, 1))
    dwf = dw_ref[:].astype(x.dtype).astype(jnp.float32)
    de_act = _dw3x3_flip(dd_up, dwf, H, W)
    if has_expand:
        mask = ((v1 > 0.0) & (v1 < 6.0)).astype(jnp.float32)
        dv1 = de_act.reshape(H * W, c) * mask
        en = (e32 - m1_ref[0][None, :]) * i1_ref[0][None, :]
        sa[0, :] += jnp.sum(dv1, axis=0)
        sb[0, :] += jnp.sum(dv1 * en, axis=0)
    else:
        dv1 = de_act.reshape(H * W, c)
    dv1_ref[0] = dv1.astype(dv1_ref.dtype).reshape(H, W, c)

    @pl.when(b == B - 1)
    def _():
        ddw_ref[:] = sdw[:]
        ra_ref[:] = sa[:]
        rb_ref[:] = sb[:]


def _expand_bwd_kernel(x_ref, w1_ref, m1_ref, i1_ref, u1_ref, p1_ref,
                       q1_ref, dv1_ref, dx_ref, dw1_ref, sdw1, *, H, W):
    b = pl.program_id(0)
    B = pl.num_programs(0)
    c = dv1_ref.shape[-1]

    @pl.when(b == 0)
    def _():
        sdw1[:] = jnp.zeros_like(sdw1)

    x = x_ref[0]
    cin = x.shape[-1]
    xm = x.reshape(H * W, cin)
    e = jnp.dot(xm, w1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    e32 = e.astype(jnp.float32)
    en = (e32 - m1_ref[0][None, :]) * i1_ref[0][None, :]
    dv1 = dv1_ref[0].astype(jnp.float32).reshape(H * W, c)
    de = u1_ref[0][None, :] * dv1 - p1_ref[0][None, :] \
        - q1_ref[0][None, :] * en
    de_bf = de.astype(x.dtype)
    sdw1[:] += jax.lax.dot_general(
        xm, de_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx = jax.lax.dot_general(
        de_bf, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype).reshape(H, W, cin)

    @pl.when(b == B - 1)
    def _():
        dw1_ref[:] = sdw1[:]


# -- training orchestration --------------------------------------------------


def _pad_hidden(w1, g1, be1, dwk, g2, be2, w2, padc):
    """Zero-pad the hidden (expanded) channel dim; padded channels stay
    exactly zero through the whole block and its gradients."""
    if padc == 0:
        return w1, g1, be1, dwk, g2, be2, w2
    return (jnp.pad(w1, ((0, 0), (0, padc))), jnp.pad(g1, (0, padc)),
            jnp.pad(be1, (0, padc)),
            jnp.pad(dwk, ((0, 0), (0, 0), (0, padc))),
            jnp.pad(g2, (0, padc)), jnp.pad(be2, (0, padc)),
            jnp.pad(w2, ((0, padc), (0, 0))))


def _ir_train_forward(x, w1, g1, be1, dwk, g2, be2, w2, g3, be3,
                      stride, has_expand, eps):
    B, H, W, Cin = x.shape
    _check_spatial(H, W, stride)
    Ce0 = dwk.shape[-1]
    Cout = w2.shape[-1]
    Ho, Wo = H // stride, W // stride
    residual = stride == 1 and Cin == Cout
    dt = x.dtype
    f32 = jnp.float32
    interp = _interpret()
    params0 = (w1, g1, be1, dwk, g2, be2, w2, g3, be3)
    Ce = Ce0 if not has_expand else _pad_to_lanes(Ce0)
    w1, g1, be1, dwk, g2, be2, w2 = _pad_hidden(
        w1, g1, be1, dwk, g2, be2, w2, Ce - Ce0)
    cblk = Ce if not has_expand else _hidden_chunk(Ce)
    _check_channels(cblk, stride)
    chunks = list(range(0, Ce, cblk))
    M1, M2 = B * H * W, B * Ho * Wo
    dwd = dwk.astype(f32)

    def w1c(k0):
        return (w1[:, k0:k0 + cblk] if has_expand
                else jnp.zeros((Cin, cblk))).astype(dt)

    # K1: stats of e
    if has_expand:
        parts = []
        for k0 in chunks:
            parts.append(pl.pallas_call(
                functools.partial(_stats1_kernel, H=H, W=W),
                grid=(B,),
                in_specs=[_bspec((B, H, W, Cin)), _vspec((Cin, cblk))],
                out_specs=[_vspec((1, cblk)), _vspec((1, cblk))],
                out_shape=[jax.ShapeDtypeStruct((1, cblk), f32)] * 2,
                scratch_shapes=[pltpu.VMEM((1, cblk), f32)] * 2,
                interpret=interp,
            compiler_params=_COMPILER_PARAMS,
            )(x, w1c(k0)))
        sum1 = jnp.concatenate([p[0][0] for p in parts])
        sq1 = jnp.concatenate([p[1][0] for p in parts])
        m1, v1 = _bn_stats_finalize(sum1, sq1, M1)
        s1, b1 = _fold_batch(g1.astype(f32), be1.astype(f32), m1, v1, eps)
    else:
        m1 = v1 = s1 = b1 = jnp.zeros((Ce,), f32)

    # K2: expand + depthwise per chunk -> d chunks + stats of d
    d_parts, s2_parts, q2_parts = [], [], []
    for k0 in chunks:
        d_k, su, sq = pl.pallas_call(
            functools.partial(_expand_dw_kernel, H=H, W=W, stride=stride,
                              has_expand=has_expand),
            grid=(B,),
            in_specs=[_bspec((B, H, W, Cin)), _vspec((Cin, cblk)),
                      _vspec((1, cblk)), _vspec((1, cblk)),
                      _vspec((3, 3, cblk))],
            out_specs=[_bspec((B, Ho, Wo, cblk)),
                       _vspec((1, cblk)), _vspec((1, cblk))],
            out_shape=[jax.ShapeDtypeStruct((B, Ho, Wo, cblk), dt),
                       jax.ShapeDtypeStruct((1, cblk), f32),
                       jax.ShapeDtypeStruct((1, cblk), f32)],
            scratch_shapes=[pltpu.VMEM((1, cblk), f32)] * 2,
            interpret=interp,
            compiler_params=_COMPILER_PARAMS,
        )(x, w1c(k0), s1[None, k0:k0 + cblk], b1[None, k0:k0 + cblk],
          dwd[:, :, k0:k0 + cblk])
        d_parts.append(d_k)
        s2_parts.append(su[0])
        q2_parts.append(sq[0])
    m2, v2 = _bn_stats_finalize(jnp.concatenate(s2_parts),
                                jnp.concatenate(q2_parts), M2)
    s2, b2 = _fold_batch(g2.astype(f32), be2.astype(f32), m2, v2, eps)

    # K3: project per chunk, partials summed in XLA
    y = None
    for k0, d_k in zip(chunks, d_parts):
        y_k = pl.pallas_call(
            functools.partial(_proj_kernel, Ho=Ho, Wo=Wo),
            grid=(B,),
            in_specs=[_bspec((B, Ho, Wo, cblk)), _vspec((1, cblk)),
                      _vspec((1, cblk)), _vspec((cblk, Cout))],
            out_specs=_bspec((B, Ho, Wo, Cout)),
            out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), f32),
            interpret=interp,
            compiler_params=_COMPILER_PARAMS,
        )(d_k, s2[None, k0:k0 + cblk], b2[None, k0:k0 + cblk],
          w2[k0:k0 + cblk].astype(dt))
        y = y_k if y is None else y + y_k
    y_buf = y.astype(dt)
    y32 = y_buf.astype(f32)
    sum3 = jnp.sum(y32, axis=(0, 1, 2))
    sq3 = jnp.sum(y32 * y32, axis=(0, 1, 2))
    m3, v3 = _bn_stats_finalize(sum3, sq3, M2)
    inv3 = jax.lax.rsqrt(v3 + eps)
    out = (g3.astype(f32) * (y32 - m3) * inv3 + be3.astype(f32)).astype(dt)
    if residual:
        out = x + out
    stats = (m1, v1, m2, v2, m3, v3)  # padded widths (bwd re-derives them)
    stats_pub = (m1[:Ce0], v1[:Ce0], m2[:Ce0], v2[:Ce0], m3, v3)
    resid = (x, d_parts, y_buf, stats, params0)
    return out, stats_pub, resid


def _ir_train_backward(stride, has_expand, eps, resid, ct):
    g_out, _g_stats = ct  # stats cotangents never used (EMA updates are
    #                       stop-gradient in flax too)
    x, d_parts, y_buf, stats, params = resid
    (w1, g1, be1, dwk, g2, be2, w2, g3, be3) = params
    m1, v1, m2, v2, m3, v3 = stats
    B, H, W, Cin = x.shape
    Ce0 = dwk.shape[-1]
    Cout = w2.shape[-1]
    Ho, Wo = H // stride, W // stride
    residual = stride == 1 and Cin == Cout
    dt = x.dtype
    f32 = jnp.float32
    interp = _interpret()
    g1_0, be1_0, dwk_0, w1_0, w2_0 = g1, be1, dwk, w1, w2
    Ce = Ce0 if not has_expand else _pad_to_lanes(Ce0)
    w1, g1, be1, dwk, g2p, be2p, w2 = _pad_hidden(
        w1, g1, be1, dwk, g2, be2, w2, Ce - Ce0)
    g2, be2 = g2p, be2p
    cblk = Ce if not has_expand else _hidden_chunk(Ce)
    chunks = list(range(0, Ce, cblk))
    M1, M2 = B * H * W, B * Ho * Wo
    dwd = dwk.astype(f32)

    def w1c(k0):
        return (w1[:, k0:k0 + cblk] if has_expand
                else jnp.zeros((Cin, cblk))).astype(dt)

    # BN3 backward (XLA: Cout-wide)
    inv3 = jax.lax.rsqrt(v3 + eps)
    yn = (y_buf.astype(f32) - m3) * inv3
    dout = g_out.astype(f32)
    r3a = jnp.sum(dout, axis=(0, 1, 2))
    r3b = jnp.sum(dout * yn, axis=(0, 1, 2))
    dg3 = r3b.astype(g3.dtype)
    db3 = r3a.astype(be3.dtype)
    dy = (g3.astype(f32) * inv3 * (dout - r3a / M2 - yn * (r3b / M2))
          ).astype(dt)

    inv2 = jax.lax.rsqrt(v2 + eps)
    s2, b2 = _fold_batch(g2.astype(f32), be2.astype(f32), m2, v2, eps)

    # K4 per chunk
    dv2_parts, dW2_parts, r2a_parts, r2b_parts = [], [], [], []
    for k0, d_k in zip(chunks, d_parts):
        dv2_k, dw2_k, ra, rb = pl.pallas_call(
            functools.partial(_proj_bwd_kernel, Ho=Ho, Wo=Wo),
            grid=(B,),
            in_specs=[_bspec((B, Ho, Wo, cblk)), _bspec((B, Ho, Wo, Cout)),
                      _vspec((1, cblk)), _vspec((1, cblk)),
                      _vspec((1, cblk)), _vspec((1, cblk)),
                      _vspec((cblk, Cout))],
            out_specs=[_bspec((B, Ho, Wo, cblk)), _vspec((cblk, Cout)),
                       _vspec((1, cblk)), _vspec((1, cblk))],
            out_shape=[jax.ShapeDtypeStruct((B, Ho, Wo, cblk), dt),
                       jax.ShapeDtypeStruct((cblk, Cout), f32),
                       jax.ShapeDtypeStruct((1, cblk), f32),
                       jax.ShapeDtypeStruct((1, cblk), f32)],
            scratch_shapes=[pltpu.VMEM((cblk, Cout), f32),
                            pltpu.VMEM((1, cblk), f32),
                            pltpu.VMEM((1, cblk), f32)],
            interpret=interp,
            compiler_params=_COMPILER_PARAMS,
        )(d_k, dy, s2[None, k0:k0 + cblk], b2[None, k0:k0 + cblk],
          m2[None, k0:k0 + cblk], inv2[None, k0:k0 + cblk],
          w2[k0:k0 + cblk].astype(dt))
        dv2_parts.append(dv2_k)
        dW2_parts.append(dw2_k)
        r2a_parts.append(ra[0])
        r2b_parts.append(rb[0])
    dW2 = jnp.concatenate(dW2_parts)[:Ce0].astype(w2_0.dtype)
    r2a = jnp.concatenate(r2a_parts)
    r2b = jnp.concatenate(r2b_parts)
    dg2 = r2b[:Ce0].astype(g2.dtype)
    db2 = r2a[:Ce0].astype(be2.dtype)

    u2 = g2.astype(f32) * inv2
    p2 = u2 * (r2a / M2)
    q2 = u2 * (r2b / M2)

    if has_expand:
        inv1 = jax.lax.rsqrt(v1 + eps)
        s1, b1 = _fold_batch(g1.astype(f32), be1.astype(f32), m1, v1, eps)
    else:
        inv1 = jnp.zeros((Ce,), f32)
        s1 = b1 = jnp.zeros((Ce,), f32)

    # K5 per chunk
    dv1_parts, ddw_parts, r1a_parts, r1b_parts = [], [], [], []
    for k0, d_k, dv2_k in zip(chunks, d_parts, dv2_parts):
        sl = slice(k0, k0 + cblk)
        dv1_k, ddw_k, ra, rb = pl.pallas_call(
            functools.partial(_dw_bwd_kernel, H=H, W=W, stride=stride,
                              has_expand=has_expand),
            grid=(B,),
            in_specs=[_bspec((B, H, W, Cin)), _vspec((Cin, cblk)),
                      _vspec((1, cblk)), _vspec((1, cblk)),
                      _vspec((1, cblk)), _vspec((1, cblk)),
                      _vspec((3, 3, cblk)),
                      _bspec((B, Ho, Wo, cblk)),
                      _vspec((1, cblk)), _vspec((1, cblk)),
                      _vspec((1, cblk)),
                      _bspec((B, Ho, Wo, cblk)),
                      _vspec((1, cblk)), _vspec((1, cblk))],
            out_specs=[_bspec((B, H, W, cblk)), _vspec((9, cblk)),
                       _vspec((1, cblk)), _vspec((1, cblk))],
            out_shape=[jax.ShapeDtypeStruct((B, H, W, cblk), dt),
                       jax.ShapeDtypeStruct((9, cblk), f32),
                       jax.ShapeDtypeStruct((1, cblk), f32),
                       jax.ShapeDtypeStruct((1, cblk), f32)],
            scratch_shapes=[pltpu.VMEM((9, cblk), f32),
                            pltpu.VMEM((1, cblk), f32),
                            pltpu.VMEM((1, cblk), f32)],
            interpret=interp,
            compiler_params=_COMPILER_PARAMS,
        )(x, w1c(k0), s1[None, sl], b1[None, sl], m1[None, sl],
          inv1[None, sl], dwd[:, :, sl], dv2_k,
          u2[None, sl], p2[None, sl], q2[None, sl],
          d_k, m2[None, sl], inv2[None, sl])
        dv1_parts.append(dv1_k)
        ddw_parts.append(ddw_k)
        r1a_parts.append(ra[0])
        r1b_parts.append(rb[0])
    ddw = jnp.concatenate(ddw_parts, axis=1).reshape(3, 3, Ce)[:, :, :Ce0] \
        .astype(dwk_0.dtype)
    r1a = jnp.concatenate(r1a_parts)
    r1b = jnp.concatenate(r1b_parts)

    if has_expand:
        dg1 = r1b[:Ce0].astype(g1_0.dtype)
        db1 = r1a[:Ce0].astype(be1_0.dtype)
        u1 = g1.astype(f32) * inv1
        p1 = u1 * (r1a / M1)
        q1 = u1 * (r1b / M1)
        dx = None
        dW1_parts = []
        for k0, dv1_k in zip(chunks, dv1_parts):
            sl = slice(k0, k0 + cblk)
            dx_k, dw1_k = pl.pallas_call(
                functools.partial(_expand_bwd_kernel, H=H, W=W),
                grid=(B,),
                in_specs=[_bspec((B, H, W, Cin)), _vspec((Cin, cblk)),
                          _vspec((1, cblk)), _vspec((1, cblk)),
                          _vspec((1, cblk)), _vspec((1, cblk)),
                          _vspec((1, cblk)),
                          _bspec((B, H, W, cblk))],
                out_specs=[_bspec((B, H, W, Cin)), _vspec((Cin, cblk))],
                out_shape=[jax.ShapeDtypeStruct((B, H, W, Cin), f32),
                           jax.ShapeDtypeStruct((Cin, cblk), f32)],
                scratch_shapes=[pltpu.VMEM((Cin, cblk), f32)],
                interpret=interp,
            compiler_params=_COMPILER_PARAMS,
            )(x, w1c(k0), m1[None, sl], inv1[None, sl], u1[None, sl],
              p1[None, sl], q1[None, sl], dv1_k)
            dx = dx_k if dx is None else dx + dx_k
            dW1_parts.append(dw1_k)
        dW1 = jnp.concatenate(dW1_parts, axis=1)[:, :Ce0].astype(w1_0.dtype)
        dx = dx.astype(dt)
    else:
        dx = dv1_parts[0]
        dW1 = jnp.zeros_like(w1_0)
        dg1 = jnp.zeros_like(g1_0)
        db1 = jnp.zeros_like(be1_0)

    if residual:
        dx = dx + g_out
    return (dx, dW1, dg1, db1, ddw, dg2, db2, dW2, dg3, db3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_ir_train(x, w1, g1, be1, dwk, g2, be2, w2, g3, be3,
                   stride: int = 1, has_expand: bool = True,
                   eps: float = 1e-5):
    """Fused training-mode InvertedResidual.

    Returns (out, (mean1, var1, mean2, var2, mean3, var3)) — the batch
    statistics the caller needs to update BN running averages (biased
    variance, matching flax _compute_stats). Gradients flow to every
    tensor input through the Pallas backward kernels; the stats outputs
    are stop-gradient. Equivalence + gradient tests:
    tests/test_ir_fused.py.
    """
    out, stats, _ = _ir_train_forward(x, w1, g1, be1, dwk, g2, be2, w2,
                                      g3, be3, stride, has_expand, eps)
    return out, stats


def _ir_train_fwd(x, w1, g1, be1, dwk, g2, be2, w2, g3, be3,
                  stride, has_expand, eps):
    out, stats, resid = _ir_train_forward(x, w1, g1, be1, dwk, g2, be2,
                                          w2, g3, be3, stride, has_expand,
                                          eps)
    return (out, stats), resid


def _ir_train_bwd(stride, has_expand, eps, resid, ct):
    return _ir_train_backward(stride, has_expand, eps, resid, ct)


fused_ir_train.defvjp(_ir_train_fwd, _ir_train_bwd)
