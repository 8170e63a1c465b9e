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


def fsdp_sharding(mesh: Mesh, tree, axis: str = 'data'):
    """ZeRO-3-style per-leaf shardings: each array leaf is sharded over
    `axis` along its LARGEST divisible dimension; leaves too small to
    split stay replicated.

    Parameters and optimizer state stored under these shardings cost
    1/n_devices memory per chip; XLA inserts the all-gather before each
    use and the reduce-scatter on the gradients automatically (the
    scaling-book FSDP recipe — sharding annotations, not hand-written
    collectives). The reference has no analogue (DDP replicates
    everything); this is the TPU-native upgrade for teachers/students too
    big to replicate.
    """
    n = mesh.shape[axis]

    def leaf(x):
        shape = getattr(x, 'shape', ())
        best, best_size = None, 0
        for i, d in enumerate(shape):
            if d % n == 0 and d >= n and d > best_size:
                best, best_size = i, d
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf, tree)


def shard_batch(batch: dict, mesh: Mesh, axis: str = 'data') -> dict:
    """Place a host batch dict onto the mesh, sharded along the batch dim."""
    sh = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def device_prefetch(iterator, mesh: Mesh, size: int = 2, axis: str = 'data',
                    drop_keys: Sequence[str] = ('img_ids', )):
    """Wrap a host batch iterator with a device-side look-ahead buffer.

    Eagerly `shard_batch`es up to `size` batches before the consumer asks
    for them, so the H2D transfer of batch N+1 (and the producer thread's
    collate) overlaps the device compute of step N. jax.device_put is
    async, so this never blocks the calling thread; it just keeps the
    transfer queue primed (the TPU-native analogue of the reference's
    pin_memory + worker prefetch in datasets/builder.py:76).
    """
    import collections
    buf = collections.deque()
    it = iter(iterator)

    def put(batch):
        return shard_batch(
            {k: v for k, v in batch.items() if k not in drop_keys},
            mesh, axis)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
