"""Batched data loading with aspect-ratio grouping and prefetch.

Parity targets: /root/reference/mmdet/datasets/builder.py:76
(build_dataloader), samplers/group_sampler.py:10,51 (GroupSampler /
DistributedGroupSampler: aspect-ratio-homogeneous batches, deterministic
per-epoch shuffle from seed+epoch, padding to a batch multiple).

TPU-first differences: ONE process feeds the global batch (SPMD), every
batch is collated to a single static shape (`pad_hw`, `max_gts`) so the
jitted step never recompiles, and a background thread overlaps host-side
decode/augment with device compute (the reference uses worker processes;
this image has one core, so a thread that overlaps with device steps is the
right shape). A C++ decode core can slot in behind the same interface.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from .transforms import FusedPreprocess, Resize, collate_batch


def _scale_carriers(dataset) -> List:
    """Resize/FusedPreprocess transforms reachable from a dataset (or
    wrapper), for per-batch scale override."""
    out = []
    for ds in getattr(dataset, 'datasets', None) or [dataset]:
        ds = getattr(ds, 'dataset', ds)  # Repeat/ClassBalanced wrappers
        pipeline = getattr(ds, 'pipeline', None)
        for t in getattr(pipeline, 'transforms', []):
            if isinstance(t, FusedPreprocess):
                out.append(t._scale_sampler)
            elif isinstance(t, Resize):
                out.append(t)
    return out


class GroupBatchSampler:
    """Aspect-ratio-grouped batch indices, deterministically shuffled."""

    def __init__(self, flags: np.ndarray, batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = False):
        self.flags = np.asarray(flags)
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last

    def epoch_batches(self, epoch: int) -> List[np.ndarray]:
        rng = np.random.RandomState(self.seed + epoch)
        batches = []
        for g in np.unique(self.flags):
            idx = np.nonzero(self.flags == g)[0]
            if self.shuffle:
                idx = idx[rng.permutation(len(idx))]
            # pad the tail so every batch is full (reference GroupSampler
            # rounds up with repeated samples)
            rem = len(idx) % self.batch_size
            if rem and not self.drop_last:
                extra = idx[rng.randint(0, len(idx), self.batch_size - rem)]
                idx = np.concatenate([idx, extra])
            elif rem:
                idx = idx[:len(idx) - rem]
            batches.extend(np.split(idx, len(idx) // self.batch_size))
        if self.shuffle:
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        return batches


class DataLoader:
    """Iterates collated static-shape batches with thread prefetch."""

    def __init__(self, dataset, batch_size: int, pad_hw, max_gts: int = 100,
                 shuffle: bool = True, seed: int = 0, prefetch: int = 2,
                 drop_last: bool = False, num_workers: int = 0,
                 batch_scales=None, scale_sampling: str = 'image_range'):
        # pad_hw: one (H, W) static shape, or a list of shape buckets —
        # each batch is padded to the smallest fitting bucket (bounded
        # recompilation; cheaper multi-scale batches).
        #
        # batch_scales + scale_sampling: multi-scale (mstrain) training.
        #   'image_range' (default): each IMAGE draws its own scale with
        #       the reference's range-mode semantics (transforms.py:119
        #       random_sample — short side ~ randint between the first and
        #       last scales' short sides) — exact reference parity; most
        #       batches then pad to the max bucket.
        #   'image_value': each image picks uniformly from the given list
        #       (reference multiscale_mode='value', the caffe-mstrain
        #       families) — exact reference parity.
        #   'batch': each batch samples ONE scale (deterministically from
        #       seed+epoch) for all its images, so small-scale batches run
        #       in small static pad buckets (~1.29x faster epochs,
        #       docs/PERF.md) — a measured AP-affecting deviation at
        #       miniature scale (docs/EXPERIMENTS.md mstrain A/B); opt-in
        #       via cfg.scale_sampling='batch'.
        # The per-image modes work by re-arming the pipeline's own
        # Resize/FusedPreprocess sampler with the multi-scale spec, so the
        # draw happens inside the transform exactly as in the reference.
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_hw = tuple(map(tuple, pad_hw)) \
            if isinstance(pad_hw[0], (tuple, list)) else tuple(pad_hw)
        self.batch_scales = [tuple(s) for s in batch_scales] \
            if batch_scales else None
        assert scale_sampling in ('image_range', 'image_value', 'batch')
        self.scale_sampling = scale_sampling
        carriers = _scale_carriers(dataset) if batch_scales else []
        if self.batch_scales and scale_sampling != 'batch':
            mode = 'value' if scale_sampling == 'image_value' else 'range'
            spec = self.batch_scales if mode == 'value' else \
                [self.batch_scales[0], self.batch_scales[-1]]
            for t in carriers:
                t.img_scale = spec
                t.multiscale_mode = mode
                t.batch_scale = None
            carriers = []  # no per-batch mutation in _produce
        self._scale_carriers = carriers
        self.max_gts = max_gts
        self.sampler = GroupBatchSampler(
            getattr(dataset, 'flag', np.zeros(len(dataset), np.uint8)),
            batch_size, seed=seed, shuffle=shuffle, drop_last=drop_last)
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        b = self.batch_size
        return (n + b - 1) // b

    def _produce(self, batches, q):
        # num_workers>0: per-sample decode/augment fans out over a thread
        # pool. The hot host work (JPEG decode in cv2, the fused native prep
        # kernel via ctypes) releases the GIL, so this scales with cores —
        # the SPMD analogue of the reference's worker *processes*
        # (datasets/builder.py:76 workers_per_gpu), without pickling batches
        # across a process boundary. Batch order stays deterministic; only
        # intra-batch numpy RNG interleaving varies (as with the reference's
        # unseeded worker augmentations).
        pool = None
        if self.num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
        scale_rng = np.random.RandomState(self.sampler.seed + self.epoch + 1)

        def fetch(i):
            # pipelines may drop a sample (FilterAnnotations, Albu
            # skip_img_without_anno -> None); redraw like the reference's
            # CustomDataset._rand_another retry loop (custom.py:179)
            s = self.dataset[int(i)]
            tries = 0
            while s is None:
                tries += 1
                if tries > 100:
                    raise RuntimeError(
                        'pipeline returned None for 100 consecutive '
                        'redraws — is every sample being filtered?')
                s = self.dataset[int(np.random.randint(len(self.dataset)))]
            return s

        try:
            for idx in batches:
                if self.batch_scales and self._scale_carriers:
                    # batches are produced strictly one at a time (pool.map
                    # drains before the next batch), so mutating the shared
                    # transform is race-free
                    scale = self.batch_scales[
                        scale_rng.randint(len(self.batch_scales))]
                    for t in self._scale_carriers:
                        t.batch_scale = scale
                if pool is not None:
                    samples = list(pool.map(fetch, idx))
                else:
                    samples = [fetch(i) for i in idx]
                q.put(collate_batch(samples, self.pad_hw, self.max_gts))
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
            q.put(None)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self.sampler.epoch_batches(self.epoch)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(batches, q),
                             daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


def build_dataloader(dataset, samples_per_gpu: int, num_replicas: int = 1,
                     pad_hw=(800, 1344), max_gts: int = 100,
                     shuffle: bool = True, seed: int = 0,
                     drop_last: bool = False,
                     num_workers: Optional[int] = None,
                     batch_scales=None,
                     scale_sampling: str = 'image_range') -> DataLoader:
    """Global-batch loader: batch = samples_per_gpu * num_replicas
    (the SPMD equivalent of per-GPU loaders + DistributedGroupSampler).

    num_workers=None auto-sizes the decode thread pool to the host
    (cpu_count-1, capped at the batch size; 0 on single-core hosts)."""
    batch = samples_per_gpu * num_replicas
    if num_workers is None:
        import os
        num_workers = min(max((os.cpu_count() or 1) - 1, 0), batch)
    return DataLoader(dataset, batch, pad_hw,
                      max_gts, shuffle=shuffle, seed=seed,
                      drop_last=drop_last, num_workers=num_workers,
                      batch_scales=batch_scales,
                      scale_sampling=scale_sampling)
