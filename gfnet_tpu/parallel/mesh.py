"""Device mesh + sharding helpers — the TPU-native replacement for DDP/NCCL.

The reference's only distribution strategy is NCCL DDP over torchrun ranks
(`train.py:21,57`); here a `jax.sharding.Mesh` with a `data` axis carries the
same strategy idiomatically: the batch is sharded over the axis, params are
replicated, and XLA inserts the gradient all-reduce (psum) over ICI/DCN —
no bucketing machinery needed (SURVEY.md §2.4).

Multi-host bootstrap goes through `jax.distributed.initialize` (replacing
torchrun + init_process_group); on a single process the same code paths run
on however many local devices exist (incl. the virtual CPU mesh in tests).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host-local pytree of arrays batch-sharded on the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
