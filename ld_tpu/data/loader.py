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

from .transforms import collate_batch


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
                 drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_hw = tuple(pad_hw)
        self.max_gts = max_gts
        self.sampler = GroupBatchSampler(
            getattr(dataset, 'flag', np.zeros(len(dataset), np.uint8)),
            batch_size, seed=seed, shuffle=shuffle, drop_last=drop_last)
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        b = self.batch_size
        return (n + b - 1) // b

    def _produce(self, batches, q):
        try:
            for idx in batches:
                samples = [self.dataset[int(i)] for i in idx]
                q.put(collate_batch(samples, self.pad_hw, self.max_gts))
        finally:
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
                     drop_last: bool = False) -> DataLoader:
    """Global-batch loader: batch = samples_per_gpu * num_replicas
    (the SPMD equivalent of per-GPU loaders + DistributedGroupSampler)."""
    return DataLoader(dataset, samples_per_gpu * num_replicas, pad_hw,
                      max_gts, shuffle=shuffle, seed=seed,
                      drop_last=drop_last)
