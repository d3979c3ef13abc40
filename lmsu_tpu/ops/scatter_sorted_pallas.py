"""Pallas TPU kernel: BEV scatter-max over CELL-SORTED points (MXU placement).

Fourth algorithm class for the LiDAR voxelization scatter (reference: torch
`scatter_reduce_(amax)`, lidar_encoder.py:90-96). The three measured classes
all bottleneck on row-serial dynamic-row ops (~18 ns/point on v5e):

  * XLA scatter HLO (ops/scatter.py)          — serial per-point row updates;
  * VMEM-accumulator Pallas (voxelize_pallas)  — same serial scalar updates;
  * device sort + prefix-max + gather ("sorted") — gathers are just as serial.

This kernel removes dynamic-row addressing entirely by changing the *input
contract*: points arrive pre-sorted by BEV cell id (the max-reduction is
order-invariant, so model semantics are unchanged; the host pipeline sorts
once per sample — see data/pipeline.py). With sorted input, each 128-cell
output tile owns one contiguous point span, and the whole reduction becomes
TPU-regular ops:

  1. per chunk of the span, a segmented running max via log2(W) circular-roll
     + same-cell-masked max passes (pure VPU; equal keys are contiguous in a
     sorted chunk, so a wrapped roll can only merge values of the SAME
     segment — harmless for a max);
  2. placement of each segment's chunk-max into its cell row via a one-hot
     MXU matmul: onehot[W, 128] (built in-registers from an iota compare,
     never materialized to HBM) contracted with the scanned features [W, C];
     chunk results combine with an elementwise max, so segments straddling
     chunk boundaries stay exact.

The backward pass uses the same trick in both directions: gathers of
`out[cell]` / `g[cell]` are `onehot @ tile` matmuls and the tie-count
scatter-add is the transposed contraction — bit-identical semantics to the
shared dense VJP in ops/scatter.py (ties split the cotangent evenly).

Precision: unlike ordinary matmuls, these contractions implement EXACT
selection/counting semantics, so they must not inherit the TPU MXU's
default one-pass-bf16 handling of f32 operands (that silently broke the
f32 path: wrong forward values and a backward whose winner-equality never
fired). Value-carrying dots therefore pass an explicit `precision=`
(DEFAULT for bf16 features — natively exact — HIGHEST for f32), and the
tie-count gather is always HIGHEST; see _value_precision.

Input contract: `where(valid, flat_idx, H*W)` must be non-decreasing along
the point axis of every batch row (invalid/out-of-range points sorted last).
`sort_points_by_bev_cell` below produces it on device; the data pipeline's
`sort_by_bev_cell` flag produces it on host for free at decode time.

Mesh compatibility: forward and backward are wrapped in
jax.experimental.custom_partitioning with batch-dimension rules (the op is
embarrassingly batch-parallel), same as ops/voxelize_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

_CW = 256    # backward chunk window (points per placement matmul)
_CW_FWD = 256  # forward chunk window, independently tunable (smaller
# chunks do fewer roll-max passes per point; cross-chunk segments stay
# exact via the tile accumulator's elementwise max). Must be a multiple of
# _align(dtype). SWEPT AND CLOSED on v5e (scripts/sweep_sorted_scatter.py,
# B=32 N=5000 C=128 bf16): 256 is the optimum — fwd ms 2.71 (256) / 3.33
# (512) / 4.72 (128) / 5.70 (64); per-chunk fori_loop + dynamic-slice
# overhead dominates, not scan passes.
_SCAN_EARLY_EXIT = False  # guard each scan pass with lax.cond on "some run
# exceeds the covered window". MEASURED SLOWER on v5e (fwd 4.00 vs 2.71 ms
# at cw=256): the per-pass cond breaks Mosaic's pipelining for more than
# the skipped passes save. Kept (with the equivalence tests) as the
# documented closure of the data-adaptive-scan idea.
_TILE = 128  # output cells per tile (MXU-native)
_FWD_FLAT = False  # True = forward walks ONE flat, statically-bounded
# chunk table (tile id + point offset per chunk, built by _chunk_table)
# instead of the per-tile fori_loop with a dynamic trip count, and
# max-accumulates each chunk's placement directly into the output block
# (exact: candidates are one-hot selections and rounding to the output
# dtype commutes with max). MEASURED SLOWER on v5e (B=32 N=5000 C=128
# bf16, scripts/sweep_sorted_scatter.py "--variants 256:0:1,256:0:0,128:0:1"):
# fwd 3.00 ms flat vs 2.12 ms nested (cw=128 flat 2.88) — the per-chunk
# read-modify-write of the [128, C] output slice through VMEM plus the
# init/cleanup passes cost more than the dynamic-trip-loop overhead they
# remove; the nested kernel's register-resident accumulator wins. Kept
# (equivalence-tested both ways) as the documented closure of the
# flatten-the-loop idea.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cdiv(a, b):
    return (a + b - 1) // b


def _segmented_chunk_max(x, idxc):
    """Running same-segment max over a sorted chunk.

    x [CW, C], idxc [CW, 1] int32 (sorted). After log2(CW) doubling
    passes, the last in-chunk element of every segment holds the max over
    the segment's in-chunk portion. Circular wrap is safe: equal keys in a
    sorted chunk are one segment, so wrapped merges stay within-segment.

    With _SCAN_EARLY_EXIT the scan stops at the first distance k with no
    same-cell pair k apart (Hillis-Steele coverage after the k/2 pass is k,
    so every run <= k is already fully reduced). The check is one compare +
    any() on the [CW, 1] index column — far cheaper than a [CW, C] pass —
    and data-adaptive: ~1.2 points/cell (uniform 5000-point clouds on the
    64x64 grid) needs 2-3 of the log2(CW) passes. The wrap can only
    false-positive the check when the chunk's first and last cells match,
    i.e. one giant run that genuinely needs the passes.
    """
    cw = x.shape[0]
    k = 1
    while k < cw:
        ridx = jnp.roll(idxc, k, axis=0)

        def pass_fn(x, ridx=ridx, k=k):
            return jnp.where(idxc == ridx, jnp.maximum(x, jnp.roll(x, k, 0)),
                             x)

        if _SCAN_EARLY_EXIT:
            # The pass at distance k only changes anything if some run
            # exceeds k (coverage after the k/2 pass is k). The flags are
            # monotone in k, so each pass guards itself; rolls stay static.
            x = jax.lax.cond(jnp.any(idxc == ridx), pass_fn, lambda x: x, x)
        else:
            x = pass_fn(x)
        k *= 2
    return x


def _align(dtype) -> int:
    """Dynamic dim-0 vector.load offsets must be provably aligned to the
    dtype's sublane tile once C spans multiple lane tiles (C=256 failed to
    compile unaligned on real Mosaic): 8 rows for 32-bit, 16 for 16-bit."""
    return 8 if jnp.dtype(dtype).itemsize >= 4 else 16


def _value_precision(dtype):
    """Precision for the matmuls whose RESULTS are compared for equality.

    The placement matmuls here are exact SELECTIONS, not approximate
    contractions: the forward's output and the backward's gathered cell-max
    must reproduce feature values bit-exactly, or the backward's winner
    test (featc == cellmax) silently fails. The TPU MXU at DEFAULT
    precision truncates f32 operands to one bf16 pass, which broke exactly
    that (measured on v5e: f32 fwd off by ~1e-2 and ~all-zero gradients at
    the production 64x64 grid; the CPU test suite never saw it because CPU
    f32 dots are exact at any precision). bf16 operands are consumed by
    the MXU natively, so DEFAULT stays exact AND fast there; f32 operands
    need HIGHEST (multi-pass) to round-trip values exactly.
    """
    return (jax.lax.Precision.DEFAULT
            if jnp.dtype(dtype).itemsize < 4 else jax.lax.Precision.HIGHEST)


def _fwd_kernel(starts_ref, idx_ref, feat_ref, out_ref, *,
                ntiles: int, hw: int, out_dtype, align: int):
    b = pl.program_id(0)
    cw = _CW_FWD
    assert cw % align == 0, (cw, align)
    fdt = feat_ref.dtype
    vprec = _value_precision(fdt)
    iota_cw = jax.lax.broadcasted_iota(jnp.int32, (cw, 1), 0)
    oh_iota = jax.lax.broadcasted_iota(jnp.int32, (cw, _TILE), 1)
    ones = jnp.ones((cw, 1), fdt)

    for t in range(ntiles):
        # Align the span start down to the dtype's sublane count (see
        # _align). The up-to-(align-1) foreign leading points this pulls in
        # belong to earlier tiles: their rows fall outside [0, _TILE) so the
        # one-hot never matches, and the segmented max only merges equal
        # cell ids — both directions ignore them. Features are read at
        # their native dtype (bf16 in production): max/select only move
        # values, and the one-hot placement matmuls accumulate in f32, so
        # results are bit-identical to an f32-scratch variant while the
        # roll-max scan touches half the vector registers.
        w0 = (starts_ref[b, t] // align) * align
        span = starts_ref[b, t + 1] - w0
        nch = _cdiv(span, cw)

        def chunk(j, acc, w0=w0, t=t):
            offs = pl.multiple_of(w0 + j * cw, align)
            idxc = idx_ref[pl.ds(offs, cw), :]
            x = feat_ref[pl.ds(offs, cw), :]
            x = _segmented_chunk_max(x, idxc)
            last = (idxc != jnp.roll(idxc, -1, axis=0)) | (iota_cw == cw - 1)
            rows = idxc - t * _TILE
            oh = ((oh_iota == rows) & last).astype(fdt)
            cand = jax.lax.dot_general(
                oh, x, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=vprec)
            hits = jax.lax.dot_general(
                oh, ones, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.where(hits > 0, jnp.maximum(acc, cand), acc)

        acc0 = jnp.full((_TILE, feat_ref.shape[1]), -jnp.inf, jnp.float32)
        acc = jax.lax.fori_loop(0, nch, chunk, acc0)
        acc = jnp.where(jnp.isneginf(acc), 0.0, acc).astype(out_dtype)
        rows_t = min(_TILE, hw - t * _TILE)
        out_ref[t * _TILE:t * _TILE + rows_t, :] = acc[:rows_t]


def _fwd_kernel_flat(off_ref, tile_ref, idx_ref, feat_ref, out_ref, *,
                     nchunks: int, out_dtype, align: int):
    """Flat-chunk-table forward: one statically-bounded loop over
    (tile, offset) pairs, max-accumulating into the output block.

    out_ref is [hw_pad, C] with hw_pad a multiple of _TILE; rows >= hw are
    scratch (the caller slices them away), which is also where sentinel
    points (cell id == hw) land, so no masking is needed. Padding chunk
    slots point at the all-sentinel tail with tile 0 and contribute
    nothing. Exactness of the read-modify-write accumulate: candidates are
    bf16 feature values selected by one-hot matmuls (f32 accumulate), and
    rounding to the output dtype is monotone, so per-chunk rounding
    commutes with the running max.
    """
    b = pl.program_id(0)
    cw = _CW_FWD
    fdt = feat_ref.dtype
    vprec = _value_precision(fdt)
    iota_cw = jax.lax.broadcasted_iota(jnp.int32, (cw, 1), 0)
    oh_iota = jax.lax.broadcasted_iota(jnp.int32, (cw, _TILE), 1)
    ones = jnp.ones((cw, 1), fdt)
    out_ref[:] = jnp.full(out_ref.shape, -jnp.inf, out_ref.dtype)

    def chunk(s, _):
        offs = pl.multiple_of(off_ref[b, s], align)
        t = tile_ref[b, s]
        idxc = idx_ref[pl.ds(offs, cw), :]
        x = feat_ref[pl.ds(offs, cw), :]
        x = _segmented_chunk_max(x, idxc)
        last = (idxc != jnp.roll(idxc, -1, axis=0)) | (iota_cw == cw - 1)
        rows = idxc - t * _TILE
        oh = ((oh_iota == rows) & last).astype(fdt)
        cand = jax.lax.dot_general(
            oh, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=vprec)
        hits = jax.lax.dot_general(
            oh, ones, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r0 = pl.multiple_of(t * _TILE, _TILE)
        cur = out_ref[pl.ds(r0, _TILE), :].astype(jnp.float32)
        new = jnp.where(hits > 0, jnp.maximum(cur, cand), cur)
        out_ref[pl.ds(r0, _TILE), :] = new.astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, chunk, 0)
    # Cleanup compares in f32: Mosaic has no bf16 vector eq on this target
    # (isneginf lowers to cmpf eq), and the upcast is exact.
    o = out_ref[:]
    out_ref[:] = jnp.where(jnp.isneginf(o.astype(jnp.float32)),
                           jnp.zeros_like(o), o)


def _bwd_kernel(starts_ref, idx_ref, feat_ref, out_g_ref, dout_ref,
                dsc_ref, *, ntiles: int, hw: int, n: int, align: int):
    """d_feat[p] = winner[p] * g[cell[p]] / ties[cell[p]] (dense-VJP parity).

    out_g is [hw, 2C]: the forward output and the cotangent, concatenated on
    the lane axis so one placement matmul gathers both per point.
    """
    b = pl.program_id(0)
    cw = _CW
    C = feat_ref.shape[1]
    fdt = feat_ref.dtype
    vprec = _value_precision(fdt)
    dsc_ref[:] = jnp.zeros_like(dsc_ref)
    oh_iota = jax.lax.broadcasted_iota(jnp.int32, (cw, _TILE), 1)

    for t in range(ntiles):
        # Span start aligned down to the dtype's sublane count (same Mosaic
        # requirement as the forward; see _align).
        w0 = (starts_ref[b, t] // align) * align
        span = starts_ref[b, t + 1] - w0
        nch = _cdiv(span, cw)
        rows_t = min(_TILE, hw - t * _TILE)
        # og stays at the feature dtype: the placement matmuls below are
        # pure one-hot SELECTIONS with f32 accumulation, so bf16 inputs
        # lose nothing and run the MXU at full rate.
        og = out_g_ref[t * _TILE:t * _TILE + rows_t, :]
        if rows_t < _TILE:
            og = jnp.pad(og, ((0, _TILE - rows_t), (0, 0)))

        def gather_winner(j, w0=w0, t=t, og=og):
            offs = pl.multiple_of(w0 + j * cw, align)
            idxc = idx_ref[pl.ds(offs, cw), :]
            featc = feat_ref[pl.ds(offs, cw), :].astype(jnp.float32)
            oh = (oh_iota == (idxc - t * _TILE))
            # This gather must reproduce out[cell] exactly (the winner test
            # below compares it for equality): value precision, see
            # _value_precision.
            cm_g = jax.lax.dot_general(
                oh.astype(fdt), og, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=vprec)
            cellmax, gcell = cm_g[:, :C], cm_g[:, C:]
            # Tail points past the span match no row: oh row is all-zero, so
            # cellmax/gcell are 0 there and their count contribution is 0.
            winner = (featc == cellmax)
            return offs, oh, winner, gcell

        def count_pass(j, counts):
            # 0/1 products accumulated in f32: exact integer counts even
            # with sub-32-bit matmul inputs.
            _, oh, winner, _ = gather_winner(j)
            return counts + jax.lax.dot_general(
                oh.astype(fdt), winner.astype(fdt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        counts = jax.lax.fori_loop(
            0, nch, count_pass, jnp.zeros((_TILE, C), jnp.float32))

        def write_pass(j, _):
            offs, oh, winner, gcell = gather_winner(j)
            # The tie-count gather must be EXACT: `counts` holds integers
            # up to the span length, beyond bf16's exact range, and the
            # MXU's default one-pass bf16 handling of f32 operands would
            # misround counts > 256 (possible in production: duplicated
            # pad points marked valid all tie in one cell). HIGHEST here
            # measured +1.4 ms on the whole bwd (6 passes), so instead
            # split counts into two bf16-exact parts — multiples of 256
            # (exact for counts < 65536) and a remainder in [0, 255] —
            # and contract each at DEFAULT: exactly-representable values
            # survive the truncation, so two one-pass dots are exact.
            c_hi = jnp.floor(counts * (1.0 / 256.0)) * 256.0
            c_lo = counts - c_hi
            ohf = oh.astype(jnp.float32)
            dn = (((1,), (0,)), ((), ()))
            cnt = (jax.lax.dot_general(
                       ohf, c_hi, dimension_numbers=dn,
                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(
                       ohf, c_lo, dimension_numbers=dn,
                       preferred_element_type=jnp.float32))
            d = winner.astype(jnp.float32) * gcell / jnp.maximum(cnt, 1.0)
            # Chunks overrun into neighbouring tiles' points (tails always;
            # heads too now that starts are aligned down). Foreign rows
            # contribute exactly 0 (their one-hot row is all-zero, so
            # gcell=0 -> d=0), so ACCUMULATING is safe in every order while
            # a plain store would clobber the owning tile's earlier write.
            dsc_ref[pl.ds(offs, cw), :] = dsc_ref[pl.ds(offs, cw), :] + d
            return 0

        jax.lax.fori_loop(0, nch, write_pass, 0)

    dout_ref[:] = dsc_ref[:n, :].astype(dout_ref.dtype)


def _prep(features, flat_idx, valid, hw):
    """Sentinel-map invalid points, pad to chunk granularity, tile starts."""
    B, N, C = features.shape
    idx_eff = jnp.where(valid, flat_idx, hw).astype(jnp.int32)
    m = max(_CW, _CW_FWD)
    NP = _round_up(N, m) + m
    idx_p = jnp.pad(idx_eff, ((0, 0), (0, NP - N)), constant_values=hw)
    feat_p = jnp.pad(features, ((0, 0), (0, NP - N), (0, 0)))
    ntiles = _cdiv(hw, _TILE)
    bounds = jnp.minimum(
        jnp.arange(ntiles + 1, dtype=jnp.int32) * _TILE, hw)
    starts = jax.vmap(
        lambda s: jnp.searchsorted(s, bounds, side="left").astype(jnp.int32)
    )(idx_p)
    return idx_p[..., None], feat_p, starts, ntiles


def _chunk_table(starts, ntiles, NP, align, cw):
    """Flatten per-tile chunk spans into a static-length (offset, tile)
    table per batch row.

    starts [B, ntiles+1]; returns off [B, S], tile [B, S] int32 with
    S = ntiles + ceil((NP + ntiles*(align-1)) / cw) — an upper bound on
    sum_t ceil(span_t / cw) since alignment pull-down adds < align points
    per tile. Slots past the real chunk count point at the all-sentinel
    tail (offset NP - cw, tile 0) and contribute nothing in the kernel.
    """
    w0 = (starts[:, :-1] // align) * align
    span = starts[:, 1:] - w0
    nch = _cdiv(span, cw)
    S = ntiles + _cdiv(NP + ntiles * (align - 1), cw)
    cum = jnp.concatenate(
        [jnp.zeros((starts.shape[0], 1), jnp.int32),
         jnp.cumsum(nch, axis=1, dtype=jnp.int32)], axis=1)
    s_iota = jnp.arange(S, dtype=jnp.int32)
    tile = jax.vmap(
        lambda c: jnp.searchsorted(c, s_iota, side="right").astype(jnp.int32)
        - 1)(cum)
    total = cum[:, -1:]
    pad = s_iota[None, :] >= total
    tile_c = jnp.clip(tile, 0, ntiles - 1)
    j = s_iota[None, :] - jnp.take_along_axis(cum, tile_c, axis=1)
    off = jnp.take_along_axis(w0, tile_c, axis=1) + j * cw
    off = jnp.where(pad, NP - cw, off).astype(jnp.int32)
    tile = jnp.where(pad, 0, tile_c).astype(jnp.int32)
    return off, tile, S


def _forward(features, flat_idx, valid, grid_size):
    B, N, C = features.shape
    H, W = grid_size
    hw = H * W
    idx_p, feat_p, starts, ntiles = _prep(features, flat_idx, valid, hw)
    NP = feat_p.shape[1]
    align = _align(features.dtype)
    interpret = jax.default_backend() == "cpu"
    if _FWD_FLAT:
        off, tile, S = _chunk_table(starts, ntiles, NP, align, _CW_FWD)
        hw_pad = ntiles * _TILE
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_flat, nchunks=S,
                              out_dtype=features.dtype, align=align),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((None, NP, 1), lambda b, off, tile: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((None, NP, C), lambda b, off, tile: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((None, hw_pad, C),
                                       lambda b, off, tile: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((B, hw_pad, C), features.dtype),
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(off, tile, idx_p, feat_p)
        return out[:, :hw].reshape(B, H, W, C)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, ntiles=ntiles, hw=hw,
                          out_dtype=features.dtype,
                          align=align),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((None, NP, 1), lambda b, starts: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, NP, C), lambda b, starts: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, hw, C), lambda b, starts: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), features.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(starts, idx_p, feat_p)
    return out.reshape(B, H, W, C)


def _backward(features, flat_idx, valid, out, g, grid_size):
    B, N, C = features.shape
    H, W = grid_size
    hw = H * W
    idx_p, feat_p, starts, ntiles = _prep(features, flat_idx, valid, hw)
    NP = feat_p.shape[1]
    out_g = jnp.concatenate(
        [out.reshape(B, hw, C), g.reshape(B, hw, C).astype(out.dtype)],
        axis=-1)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        functools.partial(_bwd_kernel, ntiles=ntiles, hw=hw, n=N,
                          align=_align(features.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((None, NP, 1), lambda b, starts: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, NP, C), lambda b, starts: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, hw, 2 * C), lambda b, starts: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, N, C), lambda b, starts: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((NP, C), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, C), features.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(starts, idx_p, feat_p, out_g)


# -- GSPMD batch-partitioning rules (pattern: ops/voxelize_pallas.py) -------

def _batch_axis(shapes):
    spec = shapes[0].sharding.spec
    return spec[0] if len(spec) else None


def _fwd_infer(grid_size, mesh, shapes, result_shape):
    return NamedSharding(mesh, P(_batch_axis(shapes), None, None, None))


def _fwd_partition(grid_size, mesh, shapes, result_shape):
    b = _batch_axis(shapes)

    def lower(features, flat_idx, valid):
        return _forward(features, flat_idx, valid, grid_size)

    return (mesh, lower,
            NamedSharding(mesh, P(b, None, None, None)),
            (NamedSharding(mesh, P(b, None, None)),
             NamedSharding(mesh, P(b, None)),
             NamedSharding(mesh, P(b, None))))


_forward_partitioned = custom_partitioning(_forward, static_argnums=(3,))
_forward_partitioned.def_partition(
    infer_sharding_from_operands=_fwd_infer,
    partition=_fwd_partition,
    sharding_rule="b n c, b n, b n -> b h w c")


def _bwd_infer(grid_size, mesh, shapes, result_shape):
    return NamedSharding(mesh, P(_batch_axis(shapes), None, None))


def _bwd_partition(grid_size, mesh, shapes, result_shape):
    b = _batch_axis(shapes)

    def lower(features, flat_idx, valid, out, g):
        return _backward(features, flat_idx, valid, out, g, grid_size)

    return (mesh, lower,
            NamedSharding(mesh, P(b, None, None)),
            (NamedSharding(mesh, P(b, None, None)),
             NamedSharding(mesh, P(b, None)),
             NamedSharding(mesh, P(b, None)),
             NamedSharding(mesh, P(b, None, None, None)),
             NamedSharding(mesh, P(b, None, None, None))))


_backward_partitioned = custom_partitioning(_backward, static_argnums=(5,))
_backward_partitioned.def_partition(
    infer_sharding_from_operands=_bwd_infer,
    partition=_bwd_partition,
    sharding_rule="b n c, b n, b n, b h w c, b h w c -> b n c")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bev_scatter_max_sorted_pallas(
        features: jnp.ndarray, flat_idx: jnp.ndarray, valid: jnp.ndarray,
        grid_size: Tuple[int, int]) -> jnp.ndarray:
    """Scatter-max for CELL-SORTED points: features [B,N,C], flat_idx [B,N],
    valid [B,N] -> [B,H,W,C]; untouched cells exactly 0.

    REQUIRES `where(valid, flat_idx, H*W)` non-decreasing along N (see
    module docstring); results are silently wrong otherwise. Equivalence to
    ops/scatter.py::bev_scatter_max on sorted inputs is pinned by
    tests/test_pallas.py.
    """
    return _forward_partitioned(features, flat_idx, valid, grid_size)


def _vjp_fwd(features, flat_idx, valid, grid_size):
    out = _forward_partitioned(features, flat_idx, valid, grid_size)
    return out, (features, flat_idx, valid, out)


def _vjp_bwd(grid_size, residuals, g):
    features, flat_idx, valid, out = residuals
    return (_backward_partitioned(features, flat_idx, valid, out, g,
                                  grid_size), None, None)


bev_scatter_max_sorted_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def sort_points_by_bev_cell(
        points: jnp.ndarray,
        grid_size: Tuple[int, int],
        pc_range: Tuple[float, float, float, float, float, float],
        point_valid: Optional[jnp.ndarray] = None,
):
    """Reorder points by BEV cell id (invalid last) on device.

    Returns (points_sorted, point_valid_sorted). The per-point MLP and the
    max reduction are order-invariant, so feeding sorted points to any
    encoder/scatter is semantics-preserving; it is the input contract of
    bev_scatter_max_sorted_pallas. The host pipeline's `sort_by_bev_cell`
    flag is the zero-cost-at-train-time equivalent (data/pipeline.py).
    """
    from lmsu_tpu.ops.scatter import points_to_bev_indices
    H, W = grid_size
    flat_idx, valid = points_to_bev_indices(points[..., :2], grid_size,
                                            pc_range)
    if point_valid is not None:
        valid = valid & point_valid
    key = jnp.where(valid, flat_idx, H * W).astype(jnp.int32)
    N = points.shape[-2]
    order = jnp.argsort(key, axis=-1, stable=True)
    pts = jnp.take_along_axis(points, order[..., None], axis=-2)
    pv = jnp.take_along_axis(valid, order, axis=-1)
    return pts, pv
