"""Tensor (model) parallelism for the KD teacher.

The reference is single-device (SURVEY.md §2, parallelism note) and its
573K-param student needs nothing beyond data parallelism.  The teacher is a
different story: knowledge distillation — this framework's north star — wants
the biggest teacher that will run, and a width-multiplied teacher grows
quadratically in both FLOPs and parameters (width_mult w costs ~w^2).  Tensor
parallelism over a second mesh axis lets a teacher wider than one chip's HBM
(or slower than the step budget) be sharded channel-wise across chips, the
idiomatic TPU way:

  * every conv/dense kernel is sharded on its OUTPUT-channel dim across the
    'model' axis; 1-D channel vectors (conv bias, BN scale/bias/mean/var)
    are sharded to match;
  * activations inherit a channel sharding from the kernels and GSPMD
    inserts the collectives (all-gathers where a full Cin is contracted,
    e.g. the next layer's pointwise conv) over ICI — there is no hand-written
    collective here, by design (SURVEY.md §5 "communication backend");
  * leaves whose channel count does not divide the axis stay replicated
    (e.g. the 2-class classifier head) — GSPMD reshards around them.

This is exactly the "annotate shardings, let XLA partition" recipe: the only
TP-specific code is the parameter-placement rule below.

Works on any mesh built by `make_mesh(MeshConfig(model_parallel=N))`, i.e. a
2-D ('data', 'model') mesh; with model_parallel=1 everything degenerates to
replication and the trainers behave exactly as before.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import tree_map_with_path


def _leaf_spec(path, leaf, axis: str, axis_size: int) -> P:
    """PartitionSpec for one parameter/stat leaf: shard the trailing
    (output-channel) dim on the model axis when it divides evenly."""
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    # Keep the classifier replicated: its Cout is num_classes (2-3), and a
    # 1-channel-per-device logits tensor buys nothing while forcing every
    # consumer (loss, argmax) to immediately regather.
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    if "cls" in names:
        return P()
    if shape[-1] % axis_size != 0:
        return P()
    return P(*([None] * (len(shape) - 1) + [axis]))


def tp_axis(mesh: Mesh, axis: Optional[str] = None) -> Optional[str]:
    """The model axis name if the mesh has one with size > 1, else None."""
    if axis is None:
        axis = "model"
    if axis in mesh.axis_names and mesh.shape[axis] > 1:
        return axis
    return None


def tp_shardings(variables: Any, mesh: Mesh,
                 axis: Optional[str] = None) -> Any:
    """Pytree of NamedShardings mirroring `variables` under channel TP.

    `variables` is a flax variables dict ({'params': ..., 'batch_stats':
    ...}) or any pytree of arrays; each leaf gets its trailing dim sharded
    on the mesh's model axis per `_leaf_spec`.
    """
    ax = tp_axis(mesh, axis)
    if ax is None:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), variables)
    size = mesh.shape[ax]
    return tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf, ax,
                                                          size)),
        variables)


def shard_variables_tp(variables: Any, mesh: Mesh,
                       axis: Optional[str] = None) -> Any:
    """device_put `variables` with channel-TP placement over the mesh."""
    shardings = tp_shardings(variables, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)


# -- FSDP (ZeRO-3-style) storage sharding ------------------------------------
#
# Tensor parallelism shards the teacher's COMPUTE: every device owns a
# channel slice and GSPMD all-gathers activations where a full Cin is
# contracted.  FSDP shards only the teacher's STORAGE: each weight leaf is
# split over the *data* axis, and because the batch is sharded on that same
# axis, GSPMD's only consistent plan is to all-gather each weight just
# before its conv/dense uses it (an axis can shard at most one dim of a
# tensor, so a 'data'-sharded batch and 'data'-sharded Cout cannot coexist
# in one conv output) — exactly ZeRO-3's gather-on-use, expressed as a
# placement rule with zero hand-written collectives.  Unlike tp/sp it needs
# no 'model' axis: per-device teacher parameter memory drops by the
# data-parallel degree on the plain 1-D mesh, with no efficiency loss on
# narrow layers (each device still computes the full-width conv).  The
# trade is one weight all-gather per layer per step — negligible for a
# frozen teacher whose weights are a few MB against multi-GB activations,
# and zero for the cached-teacher path after the fill epoch.


def _fsdp_leaf_spec(path, leaf, axis: str, axis_size: int) -> P:
    """Shard the leaf's largest axis-divisible dim; replicate if none.

    Unlike the TP rule there is no classifier carve-out: FSDP sharding is
    storage-only, so slicing any dim of any leaf is always semantically
    free (GSPMD regathers on use).
    """
    del path
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    divisible = [d for d, s in enumerate(shape) if s % axis_size == 0 and s]
    if not divisible:
        return P()
    best = max(divisible, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_shardings(variables: Any, mesh: Mesh,
                   axis: Optional[str] = None) -> Any:
    """Pytree of NamedShardings storage-sharding `variables` over the
    mesh's data axis (or `axis`), ZeRO-3 style."""
    if axis is None:
        axis = mesh.axis_names[0]
    size = mesh.shape[axis]
    if size == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), variables)
    return tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _fsdp_leaf_spec(path, leaf,
                                                               axis, size)),
        variables)


def shard_variables_fsdp(variables: Any, mesh: Mesh,
                         axis: Optional[str] = None) -> Any:
    """device_put `variables` with FSDP storage sharding over the mesh."""
    shardings = fsdp_shardings(variables, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)
