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
    wrapper), for per-image/per-batch scale override."""
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


def _image_dims(dataset) -> Optional[np.ndarray]:
    """(N, 2) original (height, width) per index, traversing the dataset
    wrappers; None when a dataset doesn't expose image sizes. Used by the
    scale-GROUPED mstrain modes to predict each image's resized shape."""
    if hasattr(dataset, 'datasets'):  # Concat
        parts = [_image_dims(d) for d in dataset.datasets]
        if any(p is None for p in parts):
            return None
        return np.concatenate(parts, axis=0)
    if hasattr(dataset, 'indices') and hasattr(dataset, 'dataset'):
        base = _image_dims(dataset.dataset)  # ClassBalanced
        return None if base is None else \
            base[np.asarray(dataset.indices, np.int64)]
    if hasattr(dataset, 'times') and hasattr(dataset, 'dataset'):
        base = _image_dims(dataset.dataset)  # Repeat
        return None if base is None else np.tile(base, (dataset.times, 1))
    infos = getattr(dataset, 'img_infos', None)
    if infos is not None:
        try:
            return np.asarray([[i['height'], i['width']] for i in infos],
                              np.float64)
        except (KeyError, TypeError):
            return None
    return None


class GroupBatchSampler:
    """Aspect-ratio-grouped batch indices, deterministically shuffled."""

    def __init__(self, flags: np.ndarray, batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = False):
        self.flags = np.asarray(flags)
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last

    def epoch_batches(self, epoch: int,
                      keys: Optional[np.ndarray] = None) -> List[np.ndarray]:
        """`keys` overrides the grouping key (default: the aspect flags).
        The scale-grouped mstrain modes pass flag x pad-bucket keys so each
        batch is homogeneous in its drawn scale's pad bucket — the same
        reorder trick as the reference's aspect grouping
        (/root/reference/mmdet/datasets/samplers/group_sampler.py:10),
        extended to the scale axis."""
        groups = self.flags if keys is None else np.asarray(keys)
        rng = np.random.RandomState(self.seed + epoch)
        batches, leftover = [], []
        b = self.batch_size
        for g in np.unique(groups):
            idx = np.nonzero(groups == g)[0]
            if self.shuffle:
                idx = idx[rng.permutation(len(idx))]
            rem = len(idx) % b
            full = idx[:len(idx) - rem] if rem else idx
            if len(full):
                batches.extend(np.split(full, len(full) // b))
            if rem:
                leftover.append(idx[len(idx) - rem:])
        # Group tails are MERGED into shared (bucket-heterogeneous) batches
        # instead of padding each group to a full batch with duplicates
        # (the reference GroupSampler's round-up, group_sampler.py:36):
        # per-group padding makes the epoch's batch count depend on the
        # group partition (worst case +groups-1 batches over ceil(n/b)),
        # which breaks every consumer that assumes len(loader) batches per
        # epoch — the LR schedule's steps_per_epoch and the preemption
        # resume arithmetic (apis/train.py start_epoch/skip) above all.
        # Merged tails keep the count EXACTLY ceil(n/b) (floor for
        # drop_last) in every grouping mode; collate_batch re-selects each
        # batch's pad bucket from actual shapes, so a mixed tail batch
        # costs only padding efficiency, never correctness.
        if leftover:
            left = np.concatenate(leftover)
            if self.drop_last:
                left = left[:len(left) - len(left) % b]
            else:
                pad = (-len(left)) % b
                if pad:
                    left = np.concatenate(
                        [left, left[rng.randint(0, len(left), pad)]])
            if len(left):
                batches.extend(np.split(left, len(left) // b))
        if self.shuffle:
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        return batches


class DataLoader:
    """Iterates collated static-shape batches with thread prefetch."""

    def __init__(self, dataset, batch_size: int, pad_hw, max_gts: int = 100,
                 shuffle: bool = True, seed: int = 0, prefetch: int = 2,
                 drop_last: bool = False, num_workers: int = 0,
                 batch_scales=None, scale_sampling: str = 'image_range',
                 group_pad_buckets: bool = True):
        # pad_hw: one (H, W) static shape, or a list of shape buckets —
        # each batch is padded to the smallest fitting bucket (bounded
        # recompilation; cheaper multi-scale batches).
        #
        # batch_scales + scale_sampling: multi-scale (mstrain) training.
        #   'image_range' (default): each IMAGE draws its own scale with
        #       the reference's range-mode semantics (transforms.py:119
        #       random_sample — long/short edges each ~ randint over the
        #       min/max of all given scales' long/short sides) — exact
        #       reference parity; most batches then pad to the max bucket.
        #   'image_value': each image picks uniformly from the given list
        #       (reference multiscale_mode='value', the caffe-mstrain
        #       families) — exact reference parity.
        #   'image_range_grouped' / 'image_value_grouped': SAME per-image
        #       draw (identical marginal scale distribution per image),
        #       but the batch sampler groups same-pad-bucket images into
        #       batches so each batch pads to its own bucket instead of
        #       the range max — the reference's aspect-ratio-grouping
        #       reorder trick (group_sampler.py:10) applied to the scale
        #       axis. ~1.29x faster mstrain epochs (docs/PERF.md) without
        #       the per-batch mode's correlated-scale-draw deviation.
        #   'batch': each batch samples ONE scale (deterministically from
        #       seed+epoch) for all its images — a measured AP-NEGATIVE
        #       deviation at miniature scale (docs/EXPERIMENTS.md mstrain
        #       A/B); kept opt-in for throughput-over-AP uses.
        # All modes inject the drawn scale into the pipeline's own
        # Resize/FusedPreprocess sampler via a THREAD-LOCAL override at
        # fetch time (transforms.Resize.set_scale_override): the shared
        # pipeline object is never mutated, so other consumers of the same
        # dataset see their own configured scales.
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_hw = tuple(map(tuple, pad_hw)) \
            if isinstance(pad_hw[0], (tuple, list)) else tuple(pad_hw)
        self.batch_scales = [tuple(s) for s in batch_scales] \
            if batch_scales else None
        assert scale_sampling in ('image_range', 'image_value', 'batch',
                                  'image_range_grouped',
                                  'image_value_grouped')
        self.scale_sampling = scale_sampling
        # config `group_pad_buckets=False` opts fixed-scale multi-bucket
        # configs out of the resized-shape bucket reorder (advisor r4: the
        # reorder changed batch composition for pre-existing 4+-bucket
        # configs with no switch; the reference's GroupSampler grouping is
        # likewise flag-gated)
        self.group_pad_buckets = group_pad_buckets
        self._scale_carriers = _scale_carriers(dataset)
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
        # EXACT epoch batch count in every grouping mode (the sampler
        # merges group tails to guarantee it) — steps_per_epoch and the
        # preemption-resume arithmetic depend on this being exact
        n = len(self.dataset)
        b = self.batch_size
        return n // b if self.sampler.drop_last else (n + b - 1) // b

    def _epoch_scales(self) -> Optional[List]:
        """Per-image mstrain scale draw for this epoch (deterministic in
        seed+epoch; reference random_sample/random_select semantics —
        /root/reference/mmdet/datasets/pipelines/transforms.py:119)."""
        if not self.batch_scales or self.scale_sampling == 'batch':
            return None
        rng = np.random.RandomState(self.sampler.seed + self.epoch + 1)
        n = len(self.dataset)
        if self.scale_sampling.startswith('image_value'):
            picks = rng.randint(len(self.batch_scales), size=n)
            return [self.batch_scales[j] for j in picks]
        longs = [max(s) for s in self.batch_scales]
        shorts = [min(s) for s in self.batch_scales]
        ls = rng.randint(min(longs), max(longs) + 1, size=n)
        ss = rng.randint(min(shorts), max(shorts) + 1, size=n)
        return list(zip(ls.tolist(), ss.tolist()))

    def _fixed_scales(self) -> Optional[List]:
        """Per-image scale list for pad-bucket grouping when training at a
        FIXED scale (the 1x/2x single-scale recipes). With multiple pad
        buckets, an image's resized shape is already determined by its
        original dims + the pipeline's one configured keep-ratio scale, so
        batches can be grouped aspect-bucket-homogeneously exactly like the
        grouped mstrain modes: a 4:3 COCO image resizes to 800x1067 and its
        batch pads to the (800, 1088) bucket instead of the (800, 1344)
        maximum — pure reorder, the reference's own aspect-ratio grouping
        (group_sampler.py:10) taken one step finer. Returns None when the
        resized shape is not statically predictable (mstrain, ratio_range,
        keep_ratio=False, multiple distinct Resizes); opt out with
        `group_pad_buckets=False` in the config."""
        if not self.group_pad_buckets or self.batch_scales \
                or not isinstance(self.pad_hw[0], tuple) \
                or len(self.pad_hw) <= 1:
            return None
        seen = set()
        for t in self._scale_carriers:
            sc = getattr(t, 'img_scale', None)
            if (sc is None or not getattr(t, 'keep_ratio', False)
                    or getattr(t, 'ratio_range', None) is not None
                    or isinstance(sc[0], (tuple, list))):
                return None
            seen.add(tuple(sc))
        if len(seen) != 1:
            return None
        return [seen.pop()] * len(self.dataset)

    def _bucket_keys(self, scales: List) -> np.ndarray:
        """flag x pad-bucket grouping key per image for the *_grouped
        modes: predict each image's resized (post-/32-pad) shape from its
        original dims + drawn scale, map to the smallest fitting pad
        bucket. collate_batch re-selects the bucket from the actual
        shapes, so a mispredicted key (e.g. a dim-changing aug after
        Resize) costs only grouping efficiency, never correctness."""
        from .transforms import rescale_size, select_pad_bucket
        buckets = list(self.pad_hw) if isinstance(self.pad_hw[0], tuple) \
            else [self.pad_hw]
        bucket_ids = {tuple(b): i for i, b in enumerate(buckets)}
        dims = _image_dims(self.dataset)
        flags = self.sampler.flags
        keys = np.zeros(len(scales), np.int64)
        for i, sc in enumerate(scales):
            if dims is not None and i < len(dims):
                h0, w0 = int(dims[i][0]), int(dims[i][1])
                f = rescale_size(h0, w0, sc)
                hw = (int(h0 * f + 0.5), int(w0 * f + 0.5))
            else:
                # no size metadata: assume the image fills the scale cap
                # in its flag's orientation (conservative upper bound)
                long_s, short_s = max(sc), min(sc)
                landscape = i < len(flags) and flags[i] == 1
                hw = (short_s, long_s) if landscape else (long_s, short_s)
            b = select_pad_bucket(buckets if len(buckets) > 1
                                  else buckets[0], hw)
            flag = flags[i] if i < len(flags) else 0
            keys[i] = int(flag) * len(buckets) + bucket_ids[tuple(b)]
        return keys

    def _produce(self, batches, q, scales=None):
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
        batch_scale = [None]  # 'batch' mode: current batch's shared scale

        def fetch(i):
            # pipelines may drop a sample (FilterAnnotations, Albu
            # skip_img_without_anno -> None); redraw like the reference's
            # CustomDataset._rand_another retry loop (custom.py:179)
            i = int(i)
            tries = 0
            while True:
                if self._scale_carriers:
                    # THREAD-LOCAL override: pool workers and any other
                    # consumer of the shared pipeline are unaffected
                    sc = batch_scale[0] if scales is None else scales[i]
                    for t in self._scale_carriers:
                        t.set_scale_override(sc)
                try:
                    s = self.dataset[i]
                finally:
                    for t in self._scale_carriers:
                        t.set_scale_override(None)
                if s is not None:
                    return s
                tries += 1
                if tries > 100:
                    raise RuntimeError(
                        'pipeline returned None for 100 consecutive '
                        'redraws — is every sample being filtered?')
                i = int(np.random.randint(len(self.dataset)))

        try:
            for idx in batches:
                if self.batch_scales and scales is None:
                    # 'batch' mode: one scale per batch
                    batch_scale[0] = self.batch_scales[
                        scale_rng.randint(len(self.batch_scales))]
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
        scales = self._epoch_scales()
        if scales is not None and 'grouped' in self.scale_sampling:
            keys = self._bucket_keys(scales)
        else:
            fixed = self._fixed_scales()
            keys = self._bucket_keys(fixed) if fixed is not None else None
        batches = self.sampler.epoch_batches(self.epoch, keys=keys)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(batches, q, scales),
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
                     scale_sampling: str = 'image_range',
                     group_pad_buckets: bool = True) -> DataLoader:
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
                      scale_sampling=scale_sampling,
                      group_pad_buckets=group_pad_buckets)
