"""Device mesh + sharding for data-parallel training.

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
    return Mesh(np.asarray(devices), (config.data_axis,))


def data_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Leading (batch) dim sharded across the data axis."""
    return NamedSharding(mesh, P(axis or mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch dict with dim-0 sharded on the data axis."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
