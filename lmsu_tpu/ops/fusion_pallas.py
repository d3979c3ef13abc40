"""Pallas TPU kernel: fused weighted-fusion gating.

North-star requirement: the reference's WeightedFusion attention
(fusion_module.py:115-136 — concat -> 1x1 -> ReLU -> 1x1 -> softmax(2) ->
weighted blend) fused into one kernel, so the projected features make a
single VMEM round-trip instead of five HBM-bound elementwise/matmul ops.

Kernel math per row (one BEV position, C channels):
    a  = cam @ W1c + lid @ W1l + b1          (the concat 1x1, split in two)
    h  = relu(a)
    d  = h @ (w2[:,0] - w2[:,1]) + (b2[0] - b2[1])
    g  = sigmoid(d)                           (2-way softmax == sigmoid of
                                               the logit difference)
    out = g * cam + (1 - g) * lid

Matmuls ride the MXU ([TILE_M, C] x [C, C]); everything else is VPU work on
the same VMEM tile.  Backward is a custom VJP with the analytic gradients as
dense jnp matmuls (see _gate_bwd).

Precision note: the kernel's dots accumulate in fp32
(preferred_element_type), while XLA's default matmul precision on TPU
truncates fp32 einsum inputs to bf16 — so against the *default-precision*
unfused path the outputs differ by bf16 rounding amplified through the
sigmoid gate (~0.2 max on O(1) features); the kernel is the more accurate
side. Exact math equivalence is pinned by the CPU interpret-mode tests
(tests/test_pallas.py); in production both paths run bf16 compute anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

_TILE_M = 512


def _gate_kernel(cam_ref, lid_ref, w1c_ref, w1l_ref, b1_ref, w2d_ref,
                 b2d_ref, out_ref):
    cam = cam_ref[:].astype(jnp.float32)
    lid = lid_ref[:].astype(jnp.float32)
    a = (jnp.dot(cam, w1c_ref[:], preferred_element_type=jnp.float32)
         + jnp.dot(lid, w1l_ref[:], preferred_element_type=jnp.float32)
         + b1_ref[:])
    h = jnp.maximum(a, 0.0)
    d = jnp.sum(h * w2d_ref[:], axis=-1, keepdims=True) + b2d_ref[0, 0]
    g = jax.nn.sigmoid(d)
    out_ref[:] = (g * cam + (1.0 - g) * lid).astype(out_ref.dtype)


def _gate_forward(cam, lid, w1, b1, w2, b2):
    """cam/lid [B,H,W,C]; w1 [1,1,2C,C]; b1 [C]; w2 [1,1,C,2]; b2 [2]."""
    orig_shape = cam.shape
    C = cam.shape[-1]
    cam2 = cam.reshape(-1, C)
    lid2 = lid.reshape(-1, C)
    m = cam2.shape[0]
    pad = (-m) % _TILE_M
    if pad:
        cam2 = jnp.pad(cam2, ((0, pad), (0, 0)))
        lid2 = jnp.pad(lid2, ((0, pad), (0, 0)))
    n_tiles = cam2.shape[0] // _TILE_M

    w1c = w1[0, 0, :C, :].astype(jnp.float32)
    w1l = w1[0, 0, C:, :].astype(jnp.float32)
    w2d = (w2[0, 0, :, 0] - w2[0, 0, :, 1]).astype(jnp.float32)[None, :]
    b2d = (b2[0] - b2[1]).astype(jnp.float32).reshape(1, 1)
    b1_row = b1.astype(jnp.float32)[None, :]

    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        _gate_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_M, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_M, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_M, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(cam2.shape, cam.dtype),
        interpret=interpret,
    )(cam2, lid2, w1c, w1l, b1_row, w2d, b2d)
    return out[:m].reshape(orig_shape)


# -- GSPMD batch-partitioning rule (pattern: ops/voxelize_pallas.py): the
# gate is embarrassingly batch-parallel (independent per BEV position), so
# under a data-sharded step each device runs the kernel on its own batch
# shard with the weights replicated. The custom-VJP backward is plain jnp
# and partitions natively.

def _gate_batch_axis(shapes):
    spec = shapes[0].sharding.spec
    return spec[0] if len(spec) else None


def _gate_infer(mesh, shapes, result_shape):
    return NamedSharding(mesh, P(_gate_batch_axis(shapes), None, None, None))


def _gate_partition(mesh, shapes, result_shape):
    b = _gate_batch_axis(shapes)
    rep = NamedSharding(mesh, P())
    return (mesh, _gate_forward,
            NamedSharding(mesh, P(b, None, None, None)),
            (NamedSharding(mesh, P(b, None, None, None)),
             NamedSharding(mesh, P(b, None, None, None)),
             rep, rep, rep, rep))


_gate_forward_partitioned = custom_partitioning(_gate_forward)
_gate_forward_partitioned.def_partition(
    infer_sharding_from_operands=_gate_infer,
    partition=_gate_partition,
    sharding_rule="b h w c, b h w c, e f g k, l, m n o p, q -> b h w c")


@jax.custom_vjp
def weighted_fusion_gate(cam, lid, w1, b1, w2, b2):
    """Fused gate; numerically equals the unfused path in models/fusion.py
    (equivalence covered by tests/test_pallas.py). Mesh-compatible via the
    batch partitioning rule above."""
    return _gate_forward_partitioned(cam, lid, w1, b1, w2, b2)


def _gate_fwd(cam, lid, w1, b1, w2, b2):
    out = _gate_forward_partitioned(cam, lid, w1, b1, w2, b2)
    return out, (cam, lid, w1, b1, w2, b2)


def _gate_bwd(residuals, g_out):
    cam, lid, w1, b1, w2, b2 = residuals
    C = cam.shape[-1]
    shape = cam.shape
    camf = cam.reshape(-1, C).astype(jnp.float32)
    lidf = lid.reshape(-1, C).astype(jnp.float32)
    go = g_out.reshape(-1, C).astype(jnp.float32)

    w1c = w1[0, 0, :C, :].astype(jnp.float32)
    w1l = w1[0, 0, C:, :].astype(jnp.float32)
    w2f = w2[0, 0].astype(jnp.float32)          # [C, 2]
    w2d = w2f[:, 0] - w2f[:, 1]                  # [C]

    a = camf @ w1c + lidf @ w1l + b1.astype(jnp.float32)
    h = jnp.maximum(a, 0.0)
    d = h @ w2d + (b2[0] - b2[1]).astype(jnp.float32)
    g = jax.nn.sigmoid(d)[:, None]               # [M, 1]

    # out = g*cam + (1-g)*lid
    s = jnp.sum(go * (camf - lidf), axis=-1)     # dL/dg per row
    dd = s * (g[:, 0] * (1.0 - g[:, 0]))         # dL/dd
    dh = dd[:, None] * w2d[None, :]              # [M, C]
    da = jnp.where(a > 0, dh, 0.0)

    d_cam = (go * g + da @ w1c.T).astype(cam.dtype).reshape(shape)
    d_lid = (go * (1.0 - g) + da @ w1l.T).astype(lid.dtype).reshape(shape)
    d_w1c = camf.T @ da
    d_w1l = lidf.T @ da
    d_w1 = jnp.concatenate([d_w1c, d_w1l], axis=0)[None, None].astype(w1.dtype)
    d_b1 = jnp.sum(da, axis=0).astype(b1.dtype)
    dw2col = h.T @ dd                            # [C]
    d_w2 = jnp.stack([dw2col, -dw2col], axis=-1)[None, None].astype(w2.dtype)
    sdd = jnp.sum(dd)
    d_b2 = jnp.stack([sdd, -sdd]).astype(b2.dtype)
    return d_cam, d_lid, d_w1, d_b1, d_w2, d_b2


weighted_fusion_gate.defvjp(_gate_fwd, _gate_bwd)
