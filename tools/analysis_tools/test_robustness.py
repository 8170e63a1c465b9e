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
        return ds.evaluate(dets)['bbox_mAP']

    results['clean'] = run()
    for corruption in args.corruptions:
        for sev in args.severities:
            key = f'{corruption}_s{sev}'
            results[key] = run(dict(type='Corrupt', corruption=corruption,
                                    severity=sev))
            print(f'{key}: mAP {results[key]:.4f}')
    corrupted = [v for k, v in results.items() if k != 'clean']
    results['mPC'] = float(np.mean(corrupted))
    results['rPC'] = results['mPC'] / max(results['clean'], 1e-6)
    print(json.dumps(results, indent=2))
    with open(args.out, 'w') as f:
        json.dump(results, f)


if __name__ == '__main__':
    main()
