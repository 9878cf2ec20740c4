"""Device mesh + sharding helpers.

The reference is single-GPU (wgan_gp.py:114-115 N_GPUS=1); the TPU build is
mesh-polymorphic from day one: a 1-axis 'data' mesh shards the batch over
ICI, params are replicated, and XLA inserts the gradient all-reduce when
jit sees replicated-out params from sharded-in batches.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and
the same code paths run over DCN.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[Any]] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Pytree of [B, ...] arrays -> batch sharded on `axis`.

    Single-process: device_put. Multi-host: each process passes its LOCAL
    per-host batch (loader host_id/host_count shards) and the global array
    is assembled across processes — device_put cannot target
    non-addressable devices.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    if jax.process_count() > 1:
        # Every process holds the full value (same init seed / restored
        # checkpoint), so local data == global data for a replicated spec.
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed over DCN). No-op when already
    initialized or single-process. The same Mesh/pjit code then spans all
    hosts' devices; pair with TFRecordPairLoader(host_id=..., host_count=...)
    for disjoint input shards.
    """
    import jax.distributed
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError:
        pass  # already initialized
