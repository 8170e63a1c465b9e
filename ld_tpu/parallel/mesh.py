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


def param_sharding(mesh: Mesh, tree, fsdp_axis: Optional[str] = None,
                   tp_axis: Optional[str] = None,
                   exclude_substrings: Sequence[str] = ()):
    """Per-leaf parameter/optimizer shardings combining two axes:

    * ``tp_axis`` — tensor parallelism: the LAST divisible dimension of
      each leaf is sharded (conv kernels split on C_out, dense kernels on
      features, biases/BN vectors on their only dim). Megatron-style
      weight-stationary layout: activations pick up the channel sharding
      by GSPMD propagation and XLA inserts the psum/all-gather where
      consecutive layers disagree.
    * ``fsdp_axis`` — ZeRO-3: the LARGEST remaining divisible dimension
      is sharded. Pure memory layout (1/n state per chip); XLA inserts
      all-gather-at-use + reduce-scatter-on-grads (the scaling-book FSDP
      recipe — sharding annotations, not hand-written collectives).

    Both compose on one leaf (different dims, different mesh axes).
    Leaves too small to split stay replicated. The reference has no
    analogue (DDP replicates everything).

    ``exclude_substrings`` — keystr substrings of leaves that must stay
    REPLICATED regardless of the fsdp/tp rules. Used when composing with
    spatial partitioning: the current XLA SPMD partitioner produces wrong
    results for convolutions whose activations are H-sharded AND whose
    weights are channel-sharded (bisected leaf-class by leaf-class in
    tests/test_parallel.py — a pure forward drifts 1.5-2.8e-3 depending on
    the sharded dim), so every param of an sp-resident backbone stage
    (utils/act_sharding.sp_resident_param_patterns) is kept replicated.
    Those are the shallow high-res stages — a small fraction of the
    parameters, so ZeRO-3 keeps nearly all of its memory win.
    tests/test_parallel.py::test_sp_fsdp_without_workaround_canary is a
    strict-xfail canary that runs the sp+fsdp gradient WITHOUT the
    exclusion: the day a jax/XLA upgrade fixes the partitioner it XPASSes
    loudly and this workaround (and its replication cost) can be
    removed."""
    nf = mesh.shape[fsdp_axis] if fsdp_axis else 1
    nt = mesh.shape[tp_axis] if tp_axis else 1

    def leaf(path, x):
        shape = getattr(x, 'shape', ())
        spec = [None] * len(shape)
        if exclude_substrings:
            ks = jax.tree_util.keystr(path)
            if any(pat in ks for pat in exclude_substrings):
                return NamedSharding(mesh, P())
        if tp_axis and nt > 1:
            for i in reversed(range(len(shape))):
                if shape[i] % nt == 0 and shape[i] >= nt:
                    spec[i] = tp_axis
                    break
        if fsdp_axis and nf > 1:
            best, best_size = None, 0
            for i, d in enumerate(shape):
                if spec[i] is None and d % nf == 0 and d >= nf \
                        and d > best_size:
                    best, best_size = i, d
            if best is not None:
                spec[best] = fsdp_axis
        if not any(spec):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(leaf, tree)


def fsdp_sharding(mesh: Mesh, tree, axis: str = 'data'):
    """ZeRO-3-only shardings (see param_sharding)."""
    return param_sharding(mesh, tree, fsdp_axis=axis)


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
