"""Dataset wrappers: Concat / Repeat / ClassBalanced.

Parity: /root/reference/mmdet/datasets/dataset_wrappers.py:14,128,172.
"""
from __future__ import annotations

import bisect
import math
from collections import defaultdict

import numpy as np

from ld_tpu.utils.registry import DATASETS


def _build(cfg):
    return DATASETS.build(dict(cfg)) if isinstance(cfg, dict) else cfg


@DATASETS.register_module()
class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = [_build(d) for d in datasets]
        self.CLASSES = self.datasets[0].CLASSES
        self.cumulative = np.cumsum([len(d) for d in self.datasets])
        self.flag = np.concatenate([
            getattr(d, 'flag', np.zeros(len(d), np.uint8))
            for d in self.datasets
        ])

    def __len__(self):
        return int(self.cumulative[-1])

    def _locate(self, idx):
        di = bisect.bisect_right(self.cumulative, idx)
        base = 0 if di == 0 else int(self.cumulative[di - 1])
        return di, idx - base

    def __getitem__(self, idx):
        di, li = self._locate(idx)
        return self.datasets[di][li]

    def get_ann_info(self, idx):
        di, li = self._locate(idx)
        return self.datasets[di].get_ann_info(li)


@DATASETS.register_module()
class RepeatDataset:
    def __init__(self, dataset, times):
        self.dataset = _build(dataset)
        self.times = times
        self.CLASSES = self.dataset.CLASSES
        base_flag = getattr(self.dataset, 'flag',
                            np.zeros(len(self.dataset), np.uint8))
        self.flag = np.tile(base_flag, times)

    def __len__(self):
        return self.times * len(self.dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(idx % len(self.dataset))


@DATASETS.register_module()
class ClassBalancedDataset:
    """Oversample images containing rare categories (LVIS-style repeat
    factors: r(I) = max_c max(1, sqrt(t / f_c)))."""

    def __init__(self, dataset, oversample_thr=1e-3):
        self.dataset = _build(dataset)
        self.CLASSES = self.dataset.CLASSES
        n = len(self.dataset)
        cat_freq = defaultdict(float)
        img_cats = []
        for i in range(n):
            cats = set(self.dataset.get_ann_info(i)['labels'].tolist())
            img_cats.append(cats)
            for c in cats:
                cat_freq[c] += 1.0 / n
        cat_repeat = {
            c: max(1.0, math.sqrt(oversample_thr / f))
            for c, f in cat_freq.items()
        }
        indices = []
        for i, cats in enumerate(img_cats):
            r = max((cat_repeat[c] for c in cats), default=1.0)
            indices.extend([i] * int(math.ceil(r)))
        self.indices = np.asarray(indices)
        base_flag = getattr(self.dataset, 'flag', np.zeros(n, np.uint8))
        self.flag = base_flag[self.indices]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[int(self.indices[idx])]

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(int(self.indices[idx]))
