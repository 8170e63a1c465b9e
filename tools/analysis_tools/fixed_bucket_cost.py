#!/usr/bin/env python
"""Expected FIXED-scale (1x/2x) step cost under the default pad buckets.

Host-side, no TPU needed: simulates one epoch of the default COCO loader
(configs/_base_/datasets/coco_detection.py six-bucket `pad_to`, single
keep-ratio (1333, 800) Resize) over a COCO-shaped size distribution,
counts batches per bucket for `group_pad_buckets=True` (the r4 default —
resized-shape bucket grouping, loader.py `_fixed_scales`) vs `False`
(dataset order, every batch pads to its members' max bucket), and prices
each bucket with the per-bucket LD-R101->R50 b8 step times MEASURED on
1 v5e chip (docs/PERF.md r5 bucket table; pass --ms to re-price).

The COCO-shaped distribution is the same val2017-marginal mix the
mstrain cost simulator uses (mstrain_grouped_cost.py).

Usage: python tools/analysis_tools/fixed_bucket_cost.py \
           [--images 20000] [--batch 8] \
           [--ms 1088=XX.X 1216=YY.Y 1344=113.5]
"""
import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=20000)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--ms', nargs='+',
                    default=['1088=92.8', '1216=102.5', '1344=113.5'],
                    help='long-side=ms/step prices (portrait buckets use '
                         'their landscape twin: same pixel count)')
    args = ap.parse_args()
    prices = {int(k): float(v) for k, v in
              (s.split('=') for s in args.ms)}

    from ld_tpu import Config
    from ld_tpu.data.loader import DataLoader
    from ld_tpu.data.transforms import Resize

    base = Config.fromfile(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '..', '..',
        'configs/_base_/datasets/coco_detection.py'))
    pad_to = [tuple(p) for p in base['pad_to']]

    # COCO-shaped original sizes (val2017 marginals — same mix as
    # mstrain_grouped_cost.py)
    rs = np.random.RandomState(0)
    choices = [(480, 640), (640, 480), (427, 640), (425, 640), (612, 612),
               (375, 500), (640, 426), (360, 640), (640, 512), (483, 640)]
    probs = np.array([.42, .17, .12, .05, .04, .05, .06, .04, .03, .02])
    idx = rs.choice(len(choices), size=args.images, p=probs / probs.sum())
    dims = np.array([choices[i] for i in idx], np.float64)

    class _SizedDataset:
        def __init__(self, dims):
            self.img_infos = [dict(id=i, height=int(h), width=int(w))
                              for i, (h, w) in enumerate(dims)]
            self.flag = (dims[:, 1] / dims[:, 0] > 1).astype(np.uint8)
            self.pipeline = type('P', (), {'transforms': [
                Resize(img_scale=(1333, 800), keep_ratio=True)]})()

        def __len__(self):
            return len(self.img_infos)

    ds = _SizedDataset(dims)
    out = {}
    for grouped in (True, False):
        dl = DataLoader(ds, args.batch, [tuple(p) for p in pad_to],
                        seed=0, group_pad_buckets=grouped)
        fixed = dl._fixed_scales()
        keys = dl._bucket_keys(fixed) if fixed is not None else None
        batches = dl.sampler.epoch_batches(0, keys=keys)
        all_keys = dl._bucket_keys([(1333, 800)] * len(ds))
        per_batch = [max(all_keys[i] % len(pad_to) for i in b)
                     for b in batches]
        counts = collections.Counter(max(pad_to[k]) for k in per_batch)
        total = sum(prices[s] * n for s, n in counts.items())
        out[grouped] = dict(batches=len(batches),
                            by_long_side=dict(sorted(counts.items())),
                            expected_ms_per_step=round(
                                total / len(batches), 1))
        print(f'group_pad_buckets={grouped}: {out[grouped]}')
    speedup = (out[False]['expected_ms_per_step'] /
               out[True]['expected_ms_per_step'])
    print(f'expected step-cost ratio ungrouped/grouped: {speedup:.2f}x')


if __name__ == '__main__':
    main()
