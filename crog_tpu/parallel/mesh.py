"""Device mesh + sharding helpers.

The reference's distributed layer is NCCL process groups + DDP + SyncBN +
manual all_reduce/all_gather calls (SURVEY.md section 2.5).  The TPU-native
replacement is declarative: one ``Mesh`` over all chips with a ``data`` axis,
batches sharded along it, parameters replicated.  XLA then inserts the
gradient all-reduces (DDP), global batch-norm statistics (SyncBN), and metric
reductions (all_reduce/concat_all_gather) automatically — collectives ride
ICI within a slice.

For CROG-scale models (~150M params) pure data parallelism is the right
layout; the mesh helpers accept extra axes (e.g. ('data', 'model')) so tensor
sharding can be layered on without touching the engine.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


def get_mesh(
    devices: Optional[Sequence] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """Build (and cache) the global device mesh."""
    global _MESH
    if devices is None and _MESH is not None and _MESH.axis_names == tuple(
        axis_names
    ):
        return _MESH
    devs = np.asarray(devices if devices is not None else jax.devices())
    if len(axis_names) > 1:
        devs = devs.reshape([-1] + [1] * (len(axis_names) - 1))
    mesh = Mesh(devs, tuple(axis_names))
    if devices is None:
        _MESH = mesh
    return mesh


def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    return NamedSharding(mesh or get_mesh(), P())


def data_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Batch-dim sharding along the data axis."""
    return NamedSharding(mesh or get_mesh(), P("data"))


def replicate(tree, mesh: Optional[Mesh] = None):
    """Place every leaf replicated across the mesh."""
    s = replicated_sharding(mesh)
    return jax.device_put(tree, s)


def gather_metrics(values) -> np.ndarray:
    """Concatenate per-host metric arrays across processes (the reference's
    concat_all_gather, utils/misc.py:46-59).  Single-host: identity."""
    values = np.asarray(values)
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    return np.concatenate(
        np.asarray(multihost_utils.process_allgather(values))
    )


def shard_batch(tree, mesh: Optional[Mesh] = None):
    """Place every leaf with its leading axis split across the data axis.

    Equivalent of the reference's DistributedSampler split + per-rank H2D copy
    (train_crog.py:182-184, engine/crog_engine.py:60-66) in one call.
    """
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
