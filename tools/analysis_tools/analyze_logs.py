#!/usr/bin/env python
"""Analyze training json logs: loss curves and average iteration time.

Parity: /root/reference/tools/analysis_tools/analyze_logs.py
(plot_curve / cal_train_time over the runner's .log.json).
"""
import argparse
import json
from collections import defaultdict

import numpy as np


def load_log(path):
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def cal_train_time(entries):
    times = [e['time'] for e in entries if e.get('mode') == 'train'
             and 'time' in e]
    if not times:
        print('no timing entries')
        return
    t = np.asarray(times)
    print(f'average iter time: {t.mean():.4f} s/iter')
    print(f'fastest: {t.min():.4f}  slowest: {t.max():.4f}  '
          f'std: {t.std():.4f}')


def plot_curve(entries, keys, out=None):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    series = defaultdict(list)
    for e in entries:
        if e.get('mode') != 'train':
            continue
        for k in keys:
            if k in e:
                series[k].append((e['iter'], e[k]))
    for k, pts in series.items():
        xs, ys = zip(*pts)
        plt.plot(xs, ys, label=k)
    plt.xlabel('iter')
    plt.legend()
    plt.grid(True)
    out = out or 'log_curve.png'
    plt.savefig(out, dpi=120)
    print(f'saved {out}')


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='task', required=True)
    pt = sub.add_parser('cal_train_time')
    pt.add_argument('json_log')
    pc = sub.add_parser('plot_curve')
    pc.add_argument('json_log')
    pc.add_argument('--keys', nargs='+', default=['loss'])
    pc.add_argument('--out', default=None)
    args = p.parse_args()
    entries = load_log(args.json_log)
    if args.task == 'cal_train_time':
        cal_train_time(entries)
    else:
        plot_curve(entries, args.keys, args.out)


if __name__ == '__main__':
    main()
