"""Device mesh construction for SPMD execution.

Replaces the reference's process-per-GPU NCCL world
(/root/reference/tools/dist_train.sh, mmdet/apis/train.py:74-82) with a
single-program jax.sharding.Mesh: data parallelism = batch axis sharded over
the 'data' mesh axis; gradients/metrics reduce over ICI via collectives that
XLA inserts automatically. Multi-host goes through jax.distributed.initialize
(DCN between hosts, ICI within).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axis_names: Sequence[str] = ('data', ),
                axis_sizes: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    """A mesh over all (or given) devices.

    axis_sizes of -1 means "all remaining devices on this axis".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [-1] + [1] * (len(axis_names) - 1)
    sizes = list(axis_sizes)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    assert int(np.prod(sizes)) == n, (sizes, n)
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dim over `axis`; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = 'data') -> dict:
    """Place a host batch dict onto the mesh, sharded along the batch dim."""
    sh = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
