#!/usr/bin/env python
"""Expected mstrain step cost: ungrouped vs scale-grouped batching.

Host-side, no TPU needed: simulates one epoch of the real mstrain loader
(configs/_base_/mstrain_480_800.py grid, per-image reference scale draw)
over a COCO-shaped size distribution, counts batches per static pad
bucket for scale_sampling='image_range' (ungrouped) vs
'image_range_grouped', and prices each bucket with the per-bucket
LD-R101->R50 b8 step times MEASURED on 1 v5e chip (docs/PERF.md: 480
63.9 ms / 640 88.2 ms / 800 113.5 ms; other buckets interpolated
linearly in pixel count, which those three points fit to <2%).

Usage: python tools/analysis_tools/mstrain_grouped_cost.py [--images N]
"""
import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import numpy as np

# measured (short_side -> ms/step, b8 800x1344-class geometry)
MEASURED = {480: 63.9, 640: 88.2, 800: 113.5}


def bucket_ms(short):
    ks = sorted(MEASURED)
    if short <= ks[0]:
        return MEASURED[ks[0]]
    for a, b in zip(ks, ks[1:]):
        if short <= b:
            t = (short - a) / (b - a)
            return MEASURED[a] + t * (MEASURED[b] - MEASURED[a])
    return MEASURED[ks[-1]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=20000)
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()

    from ld_tpu import Config
    from ld_tpu.data.loader import DataLoader

    base = Config.fromfile(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '..', '..',
        'configs/_base_/mstrain_480_800.py'))
    scales = [tuple(s) for s in base['batch_scales']]
    pad_to = [tuple(p) for p in base['pad_to']]

    # COCO-shaped original sizes: the val2017 marginals are ~59% 640-long
    # landscape, with a tail of portrait and odd sizes
    rs = np.random.RandomState(0)
    choices = [(480, 640), (640, 480), (427, 640), (425, 640), (612, 612),
               (375, 500), (640, 426), (360, 640), (640, 512), (483, 640)]
    probs = np.array([.42, .17, .12, .05, .04, .05, .06, .04, .03, .02])
    idx = rs.choice(len(choices), size=args.images, p=probs / probs.sum())
    dims = np.array([choices[i] for i in idx], np.float64)

    class _SizedDataset:
        """Size-only stand-in: the loader touches img_infos/flag/len."""
        def __init__(self, dims):
            self.img_infos = [dict(id=i, height=int(h), width=int(w))
                              for i, (h, w) in enumerate(dims)]
            self.flag = (dims[:, 1] / dims[:, 0] > 1).astype(np.uint8)
        def __len__(self):
            return len(self.img_infos)

    ds = _SizedDataset(dims)
    out = {}
    for mode in ('image_range', 'image_range_grouped'):
        dl = DataLoader.__new__(DataLoader)
        dl.dataset = ds
        dl.batch_size = args.batch
        dl.pad_hw = tuple(pad_to)
        dl.batch_scales = scales
        dl.scale_sampling = mode
        dl.epoch = 0
        from ld_tpu.data.loader import GroupBatchSampler
        dl.sampler = GroupBatchSampler(ds.flag, args.batch, seed=0)
        sc = dl._epoch_scales()
        keys = dl._bucket_keys(sc)
        if 'grouped' not in mode:
            # ungrouped: batches are aspect-grouped only; each batch pads
            # to the max bucket of its members
            batches = dl.sampler.epoch_batches(0)
            per_batch_keys = [max(keys[i] % len(pad_to) for i in b)
                              for b in batches]
        else:
            batches = dl.sampler.epoch_batches(0, keys=keys)
            per_batch_keys = [max(keys[i] % len(pad_to) for i in b)
                              for b in batches]
        counts = collections.Counter(
            pad_to[k][0] if pad_to[k][0] < pad_to[k][1] else pad_to[k][1]
            for k in per_batch_keys)
        total_ms = sum(bucket_ms(s) * n for s, n in counts.items())
        n_b = len(batches)
        out[mode] = dict(batches=n_b,
                         by_short_side=dict(sorted(counts.items())),
                         expected_ms_per_step=round(total_ms / n_b, 1))
        print(f'{mode}: {out[mode]}')
    speedup = (out['image_range']['expected_ms_per_step'] /
               out['image_range_grouped']['expected_ms_per_step'])
    print(f'expected epoch speedup from grouping: {speedup:.2f}x')


if __name__ == '__main__':
    main()
