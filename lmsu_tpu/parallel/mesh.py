"""Device mesh + sharding for data-parallel training, single- or multi-host.

The reference has no distributed code at all (SURVEY.md §2, parallelism
note); on TPU the equivalent capability is a 1-D data mesh with batch arrays
sharded on the data axis and parameters replicated.  XLA inserts the gradient
all-reduce over ICI — there is no NCCL analog to write.

Usage:
    mesh = make_mesh()                       # all visible devices
    batch_sharding = data_sharding(mesh)     # shard dim 0 on 'data'
    rep = replicated_sharding(mesh)          # params / opt state
    jitted = jax.jit(step, in_shardings=(rep, batch_sharding), ...)

Works identically on a real TPU slice and on the virtual 8-device CPU mesh
used by the tests (XLA_FLAGS=--xla_force_host_platform_device_count=8).

Multi-host contract (slices beyond one host, e.g. v5e-16+ — SURVEY.md §2
"TPU-native equivalents", per-host input bullet):
  * every process builds the same Mesh over jax.devices() (all processes see
    the full device list; only its own are addressable);
  * every process constructs the same dataset (same root / seed / epoch), so
    the global shuffled order is identical everywhere, and feeds its loader
    `shard_index=jax.process_index(), num_shards=jax.process_count()` — each
    host DECODES only its disjoint stripe of every global batch
    (data/pipeline.py Batcher);
  * `shard_batch` / `shard_scan_chunk` then assemble the process-local block
    into a globally-sharded jax.Array via
    jax.make_array_from_process_local_data — no host ever materializes the
    full global batch.
The per-device/per-process index math is pinned by tests/test_multichip.py
(simulated 8-process disjointness + reassembly equivalence).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmsu_tpu.config import MeshConfig


def make_mesh(config: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    config = config or MeshConfig()
    if devices is None:
        devices = jax.devices()
    if config.num_devices is not None:
        devices = devices[:config.num_devices]
    mp = config.model_parallel
    if mp > 1:
        if len(devices) % mp:
            raise ValueError(
                f"model_parallel={mp} does not divide {len(devices)} devices")
        grid = np.asarray(devices).reshape(len(devices) // mp, mp)
        return Mesh(grid, (config.data_axis, config.model_axis))
    return Mesh(np.asarray(devices), (config.data_axis,))


def data_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Leading (batch) dim sharded across the data axis."""
    return NamedSharding(mesh, P(axis or mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_data_stripes(mesh: Mesh, axis: Optional[str] = None):
    """(num_stripes, stripe_index) for THIS process under P(data) batch
    sharding: which distinct dim-0 stripe of every global batch this
    process's devices address.

    On a 1-D mesh (or whenever each process owns >= one full model group)
    this is (process_count, process_index) — the classic disjoint striping.
    When the MODEL axis spans processes (devices_per_process < model
    parallel), several processes address the SAME data rows (the batch is
    replicated along 'model'), so they must decode identical stripes and
    the number of distinct stripes is process_count / group_size. Feed the
    result to make_loader(num_shards=..., shard_index=...).
    """
    axis = axis or mesh.axis_names[0]
    D = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis))
    # Probe with one row per data shard: each device's slice start IS its
    # data-row index.
    full = sharding.devices_indices_map((D,))
    per_proc: dict = {}
    for d, idx in full.items():
        per_proc.setdefault(d.process_index, set()).add(idx[0].start or 0)
    stripes = sorted({tuple(sorted(s)) for s in per_proc.values()},
                     key=lambda t: t[0])
    # Uniformity check: stripes must be identical-or-disjoint, contiguous
    # blocks covering the axis (guaranteed for data-major reshape meshes;
    # anything else cannot be fed by contiguous loader shards).
    seen: set = set()
    for s in stripes:
        if set(s) & seen:
            raise ValueError(
                f"non-uniform process->data-stripe map {stripes}: stripes "
                "overlap without being identical; this mesh layout cannot "
                "be fed by contiguous loader shards")
        if list(s) != list(range(s[0], s[-1] + 1)):
            raise ValueError(
                f"process data stripe {s} is not contiguous")
        seen |= set(s)
    mine = tuple(sorted(per_proc[jax.process_index()]))
    return len(stripes), stripes.index(mine)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh with dim 0 sharded on 'data'.

    Single-process: `batch` is the full global batch (device_put). Multi-
    host: `batch` is this PROCESS'S local block (global rows
    [p*L:(p+1)*L], L = local batch size) and the returned arrays are
    globally sharded via jax.make_array_from_process_local_data — each host
    contributes only the rows its own devices hold.
    """
    return _put_global(batch, data_sharding(mesh), sharded_dim=0)


def shard_scan_chunk(stacked, mesh: Mesh, scan_sharding: NamedSharding):
    """Place a stacked [K, B_local, ...] scan chunk with dim 1 sharded on
    'data' (dim 0 is the scan axis). Multi-host: dim 1 is the process-local
    block of the global batch, assembled exactly like shard_batch."""
    return _put_global(stacked, scan_sharding, sharded_dim=1)


def _put_global(tree, sharding: NamedSharding, sharded_dim: int):
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)

    # Global rows = local rows x number of DISTINCT data stripes — equal to
    # process_count on a 1-D mesh, but smaller when the model axis spans
    # processes (several processes then hold identical local blocks;
    # make_array_from_process_local_data treats them as replicas).
    spec_entry = (sharding.spec[sharded_dim]
                  if len(sharding.spec) > sharded_dim else None)
    axis = spec_entry[0] if isinstance(spec_entry, tuple) else spec_entry
    num_stripes, _ = process_data_stripes(sharding.mesh, axis)

    def put(x):
        global_shape = list(x.shape)
        global_shape[sharded_dim] *= num_stripes
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), tuple(global_shape))
    return jax.tree_util.tree_map(put, tree)


def assemble_global_batch(batch, mesh: Mesh):
    """Explicit jax.make_array_from_process_local_data path regardless of
    process count (single-process: local block == full global batch). Used
    by dryrun_multichip to compile-and-execute the exact multi-host input
    assembly the trainer uses on real slices."""
    sharding = data_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)
    return jax.tree_util.tree_map(put, batch)


def local_shard_slices(sharding: NamedSharding, global_shape,
                       devices: Sequence[jax.Device]):
    """[(device, dim-0 global slice)] for `devices`, sorted by row start.

    The index math behind multi-host assembly, exposed for tests: a
    process's block is the union of its devices' slices, which must be
    contiguous, disjoint across processes, and cover the global batch.
    """
    full = sharding.devices_indices_map(tuple(global_shape))
    pairs = [(d, full[d][0]) for d in devices]
    return sorted(pairs, key=lambda t: t[1].start or 0)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
