#!/usr/bin/env python
"""Re-evaluate saved detection results against a dataset.

Parity: /root/reference/tools/analysis_tools/eval_metric.py (re-eval pkl).
Results format: .npz/.pkl with per-image dict(boxes (n,5), labels (n,)).
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import json

from ld_tpu import Config
from ld_tpu.data import build_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results', help='pickle of per-image result dicts')
    p.add_argument('--eval', default='bbox')
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data['test'])
    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    print(json.dumps(dataset.evaluate(results, metric=args.eval), indent=2,
                     default=float))


if __name__ == '__main__':
    main()
