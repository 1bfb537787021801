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
    """Place a host-local pytree of arrays batch-sharded on the mesh.

    Single-process: a plain device_put scatter. Multi-process: each process
    holds only ITS batch rows (per-process file sharding, `data/dataset.py`),
    so the global array is assembled from process-local shards — the jax
    equivalent of DDP's per-rank loaders (`train.py:123-133`).
    """
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )


def fsdp_param_sharding(mesh: Mesh, params, axis_name: str = "data", min_size: int = 2**16):
    """FSDP-style sharding spec for a (frozen) param tree.

    Each large leaf is sharded on its largest mesh-divisible axis over
    `axis_name`; XLA inserts (and overlaps) the all-gathers at use sites.
    The reference replicates the 0.3B-param DINOv2 on every DDP rank
    (`model/network.py:58`); sharding it over the data axis cuts its HBM
    footprint by the mesh size (SURVEY.md §2.4 "optionally fsdp for the
    frozen ViT"). Small leaves stay replicated.
    """
    n = mesh.shape[axis_name]

    def spec(x):
        if x.size < min_size:
            return NamedSharding(mesh, P())
        dims = list(x.shape)
        # largest divisible axis
        best = None
        for i, d in enumerate(dims):
            if d % n == 0 and (best is None or d > dims[best]):
                best = i
        if best is None:
            return NamedSharding(mesh, P())
        parts = [None] * len(dims)
        parts[best] = axis_name
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec, params)


def shard_params(mesh: Mesh, params, axis_name: str = "data"):
    """Place params according to :func:`fsdp_param_sharding`."""
    shardings = fsdp_param_sharding(mesh, params, axis_name)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
