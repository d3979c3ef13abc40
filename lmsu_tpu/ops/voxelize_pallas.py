"""Pallas TPU kernel: BEV scatter-max voxelization.

The hot irregular op of the LiDAR encoder (reference: torch
`scatter_reduce_(amax)`, lidar_encoder.py:90-96; XLA path: ops/scatter.py).

Kernel strategy: the whole [H*W, C] BEV grid for one batch element fits in
VMEM (64*64*128 fp32 = 2 MB), so the scatter never leaves VMEM:

  * grid = (B,): one program per batch element;
  * the accumulator lives in a VMEM scratch with 8 extra junk rows; invalid
    points are redirected there, so the loop body is branch-free;
  * a `fori_loop` over points performs a dynamic-row vector max — one
    C-lane VPU op per point, all in VMEM;
  * the epilogue replaces never-touched (-inf) cells with zeros, matching
    torch's include_self=False + zero-init semantics.

Autodiff: scatter-max's VJP routes each cell's cotangent to the points that
achieved the cell max; the backward pass is dense gather+compare math that
XLA fuses well, so it stays in plain jnp.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_max_kernel(idx_ref, feat_ref, out_ref, acc_ref):
    """One batch element: idx [N, 1] int32, feat [N, C] -> out [HW, C]."""
    n_points = feat_ref.shape[0]
    hw = out_ref.shape[0]

    acc_ref[:] = jnp.full_like(acc_ref, -jnp.inf)

    def body(n, _):
        row = idx_ref[n, 0]  # invalid points were redirected to row >= hw
        acc_ref[row, :] = jnp.maximum(acc_ref[row, :], feat_ref[n, :])
        return 0

    jax.lax.fori_loop(0, n_points, body, 0)

    grid = acc_ref[:hw, :]
    out_ref[:] = jnp.where(jnp.isneginf(grid), 0.0, grid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bev_scatter_max_pallas(features: jnp.ndarray, flat_idx: jnp.ndarray,
                           valid: jnp.ndarray,
                           grid_size: Tuple[int, int]) -> jnp.ndarray:
    """features [B,N,C], flat_idx [B,N], valid [B,N] -> [B,H,W,C].

    Drop-in for ops/scatter.py::bev_scatter_max (equivalence covered by
    tests/test_pallas.py)."""
    return _forward(features, flat_idx, valid, grid_size)


def _forward(features, flat_idx, valid, grid_size):
    B, N, C = features.shape
    H, W = grid_size
    hw = H * W
    idx = jnp.where(valid, flat_idx, hw).astype(jnp.int32)[..., None]  # [B,N,1]

    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        _scatter_max_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, N, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, hw, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), features.dtype),
        scratch_shapes=[pltpu.VMEM((hw + 8, C), features.dtype)],
        interpret=interpret,
    )(idx, features)
    return out.reshape(B, H, W, C)


def _fwd(features, flat_idx, valid, grid_size):
    out = _forward(features, flat_idx, valid, grid_size)
    return out, (features, flat_idx, valid, out)


def _bwd(grid_size, residuals, g):
    features, flat_idx, valid, out = residuals
    B, N, C = features.shape
    H, W = grid_size
    out_flat = out.reshape(B, H * W, C)
    g_flat = g.reshape(B, H * W, C)
    idx = jnp.clip(flat_idx, 0, H * W - 1).astype(jnp.int32)
    cell_max = jnp.take_along_axis(out_flat, idx[..., None], axis=1)
    cell_g = jnp.take_along_axis(g_flat, idx[..., None], axis=1)
    winner = (features == cell_max) & valid[..., None]
    d_features = jnp.where(winner, cell_g, 0.0).astype(features.dtype)
    return d_features, None, None


bev_scatter_max_pallas.defvjp(_fwd, _bwd)
