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

    def put(x):
        global_shape = list(x.shape)
        global_shape[sharded_dim] *= jax.process_count()
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
