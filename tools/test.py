#!/usr/bin/env python
"""Evaluation CLI.

Parity: /root/reference/tools/test.py (build model -> run over val set ->
dataset.evaluate). SPMD: the mesh evaluates a sharded global batch; there is
no dist_test.sh / result-gather step.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from ld_tpu import Config
from ld_tpu.apis import eval_detector, init_detector
from ld_tpu.data import build_dataset


def _aug_test_all(cfg, detector, variables, dataset, flat_scales,
                  max_images):
    """Serial per-image TTA (each view shape compiles once; images padded
    to /32 so the shape set is bounded)."""
    import cv2
    import numpy as np
    from ld_tpu.apis.aug_test import aug_test, build_aug_views
    if flat_scales:
        scales = [tuple(flat_scales[i:i + 2])
                  for i in range(0, len(flat_scales), 2)]
    else:
        scales = [(1333, 800)]
    norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)
    for t in cfg.data['test'].get('pipeline', []):
        if 'mean' in t:
            norm = dict(mean=list(t['mean']), std=list(t['std']),
                        to_rgb=t.get('to_rgb', True))
    results = []
    n = min(len(dataset), max_images or len(dataset))
    for i in range(n):
        info = dataset.img_infos[i]
        path = os.path.join(getattr(dataset, 'img_prefix', '') or '',
                            info['filename'])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        views = build_aug_views(img, scales, flip=True, **norm)
        results.append(aug_test(detector, variables, views, img.shape[:2]))
    # pad the tail so dataset.evaluate sees one entry per image
    import numpy as np
    for _ in range(len(dataset) - n):
        results.append(dict(boxes=np.zeros((0, 5), np.float32),
                            labels=np.zeros((0, ), np.int64)))
    return results


def main():
    p = argparse.ArgumentParser(description='Evaluate a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--eval', default='bbox')
    p.add_argument('--out', default=None, help='json output for metrics')
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--aug-test', action='store_true',
                   help='multi-scale + flip TTA with merged NMS '
                        '(reference dense_test_mixins.aug_test_bboxes)')
    p.add_argument('--aug-scales', type=int, nargs='+', default=None,
                   help='flat (long short)xN list, e.g. 1333 640 1333 800')
    p.add_argument('--fuse-conv-bn', action='store_true',
                   help='fold conv+BN algebraically (reference '
                        'tools/test.py --fuse-conv-bn; value-identical, '
                        'and on TPU XLA fuses eval BN anyway)')
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    detector, variables = init_detector(cfg, args.checkpoint)
    if args.fuse_conv_bn:
        from ld_tpu.utils.fuse_conv_bn import (fuse_conv_bn,
                                               fuse_conv_bn_cfg_ok)
        if fuse_conv_bn_cfg_ok(cfg.model):
            variables = fuse_conv_bn(variables)
        else:
            print('WARNING: --fuse-conv-bn skipped: ConvWS conv_cfg '
                  'present (weight standardization renormalizes the '
                  'kernel, the fold would be wrong)')
    dataset = build_dataset(cfg.data['test'])
    if args.aug_test:
        results = _aug_test_all(cfg, detector, variables, dataset,
                                args.aug_scales, args.max_images)
    else:
        results = eval_detector(detector, variables, dataset,
                                pad_hw=tuple(cfg.get('pad_to',
                                                     (800, 1344))),
                                max_images=args.max_images)
    metrics = dataset.evaluate(results, metric=args.eval)
    print(json.dumps(metrics, indent=2, default=float))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(metrics, f, default=float)


if __name__ == '__main__':
    main()
