#!/usr/bin/env python
"""Summarize a corruption-robustness run: P / mPC / rPC per metric.

Parity: /root/reference/tools/analysis_tools/robustness_eval.py
(get_coco_style_results / get_distortions_from_file). Consumes the JSON
written by tools/analysis_tools/test_robustness.py:
{corruption: {severity: {metric: value}}} with severity 0 = clean.

* P   = clean performance (severity 0 of the first corruption)
* mPC = mean over corruptions x severities >= 1
* rPC = mPC / P
--aggregate benchmark restricts to the 15 standard imagecorruptions
benchmark corruptions (the reference's results[:15]).
"""
import argparse
import json

import numpy as np

BENCHMARK_CORRUPTIONS = [
    'gaussian_noise', 'shot_noise', 'impulse_noise', 'defocus_blur',
    'glass_blur', 'motion_blur', 'zoom_blur', 'snow', 'frost', 'fog',
    'brightness', 'contrast', 'elastic_transform', 'pixelate',
    'jpeg_compression',
]


def summarize(eval_output, metrics=None, aggregate='benchmark'):
    corruptions = list(eval_output)
    if aggregate == 'benchmark':
        corruptions = [c for c in corruptions
                       if c in BENCHMARK_CORRUPTIONS] or corruptions
    first = next(iter(eval_output.values()))
    clean = first.get('0') or first.get(0)
    if metrics is None:
        metrics = sorted(clean)
    P = np.array([clean[m] for m in metrics], np.float32)
    rows = [[sev_metrics[m] for m in metrics]
            for c in corruptions
            for sev, sev_metrics in eval_output[c].items()
            if int(sev) >= 1]
    mPC = np.asarray(rows, np.float32).mean(axis=0)
    rPC = mPC / np.maximum(P, 1e-6)
    return metrics, P, mPC, rPC


def main():
    p = argparse.ArgumentParser()
    p.add_argument('filename', help='JSON from test_robustness.py')
    p.add_argument('--metric', nargs='+', default=None)
    p.add_argument('--prints', nargs='+', default=['P', 'mPC', 'rPC'],
                   choices=['P', 'mPC', 'rPC'])
    p.add_argument('--aggregate', default='benchmark',
                   choices=['benchmark', 'all'])
    args = p.parse_args()

    with open(args.filename) as f:
        eval_output = json.load(f)
    metrics, P, mPC, rPC = summarize(eval_output, args.metric,
                                     args.aggregate)
    print(f'model: {args.filename}')
    if 'P' in args.prints:
        print('Performance on Clean Data [P]')
        for m, v in zip(metrics, P):
            print(f'  {m:20} = {v:0.3f}')
    if 'mPC' in args.prints:
        print('Mean Performance under Corruption [mPC]')
        for m, v in zip(metrics, mPC):
            print(f'  {m:20} = {v:0.3f}')
    if 'rPC' in args.prints:
        print('Relative Performance under Corruption [rPC]')
        for m, v in zip(metrics, rPC):
            print(f'  {m:20} = {v * 100:0.1f} %')


if __name__ == '__main__':
    main()
