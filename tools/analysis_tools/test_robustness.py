#!/usr/bin/env python
"""Corruption-robustness benchmark: evaluate a detector under each
corruption x severity and report mPC (mean performance under corruption).

Parity: /root/reference/tools/analysis_tools/test_robustness.py +
robustness_eval.py.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

from ld_tpu import Config
from ld_tpu.apis import eval_detector, init_detector
from ld_tpu.data import build_dataset
from ld_tpu.data.corruptions import CORRUPTIONS


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--corruptions', nargs='+',
                   default=list(CORRUPTIONS))
    p.add_argument('--severities', nargs='+', type=int, default=[1, 3, 5])
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--out', default='robustness.json')
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    detector, variables = init_detector(cfg, args.checkpoint)
    results = {}

    def run(extra_transform=None):
        test_cfg = dict(cfg.data['test'])
        if extra_transform is not None:
            pipeline = list(test_cfg['pipeline'])
            pipeline.insert(1, extra_transform)
            test_cfg['pipeline'] = pipeline
        ds = build_dataset(test_cfg)
        dets = eval_detector(detector, variables, ds,
                             pad_hw=tuple(cfg.get('pad_to', (800, 1344))),
                             max_images=args.max_images)
        return {k: float(v) for k, v in ds.evaluate(dets).items()
                if isinstance(v, (int, float))}

    def headline(metrics):
        # dataset-dependent headline key: COCO bbox_mAP, VOC mAP/AP50
        for key in ('bbox_mAP', 'mAP', 'AP50'):
            if key in metrics:
                return metrics[key]
        return next(iter(metrics.values()))

    # reference result layout (test_robustness.py:~380 aggregated_results):
    # {corruption: {severity: {metric: value}}}; severity 0 = clean
    for corruption in args.corruptions:
        results[corruption] = {0: None}
        for sev in args.severities:
            m = run(dict(type='Corrupt', corruption=corruption,
                         severity=sev))
            results[corruption][sev] = m
            print(f'{corruption} s{sev}: mAP {headline(m):.4f}')
        with open(args.out, 'w') as f:  # incremental: survive crashes
            json.dump(results, f)
    clean = run()
    for corruption in args.corruptions:
        results[corruption][0] = clean
    corrupted = [headline(results[c][s]) for c in args.corruptions
                 for s in args.severities]
    summary = dict(P=headline(clean), mPC=float(np.mean(corrupted)))
    summary['rPC'] = summary['mPC'] / max(summary['P'], 1e-6)
    print(json.dumps(summary, indent=2))
    with open(args.out, 'w') as f:
        json.dump(results, f)


if __name__ == '__main__':
    main()
