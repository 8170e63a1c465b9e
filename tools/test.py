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


def main():
    p = argparse.ArgumentParser(description='Evaluate a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--eval', default='bbox')
    p.add_argument('--out', default=None, help='json output for metrics')
    p.add_argument('--max-images', type=int, default=None)
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    detector, variables = init_detector(cfg, args.checkpoint)
    dataset = build_dataset(cfg.data['test'])
    results = eval_detector(detector, variables, dataset,
                            pad_hw=tuple(cfg.get('pad_to', (800, 1344))),
                            max_images=args.max_images)
    metrics = dataset.evaluate(results, metric=args.eval)
    print(json.dumps(metrics, indent=2, default=float))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(metrics, f, default=float)


if __name__ == '__main__':
    main()
