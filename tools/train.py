#!/usr/bin/env python
"""Training CLI.

Parity: /root/reference/tools/train.py:86 (config load -> env collect ->
seed -> build -> train). One process drives the whole mesh — there is no
dist_train.sh equivalent because SPMD replaces the launcher: run this same
script under `jax.distributed` on every host of a multi-host slice.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from ld_tpu import Config
from ld_tpu.apis import train_detector


def parse_args():
    p = argparse.ArgumentParser(description='Train a detector')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume-from', default=None)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--max-steps', type=int, default=None,
                   help='stop after N optimizer steps (smoke runs)')
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='key=value deep config overrides')
    return p.parse_args()


def _parse_options(pairs):
    out = {}
    for pair in pairs:
        key, value = pair.split('=', 1)
        try:
            import ast
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        out[key] = value
    return out


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(_parse_options(args.cfg_options))
    if args.seed is not None:
        cfg['seed'] = args.seed
    if args.resume_from:
        cfg['resume_from'] = args.resume_from
    work_dir = args.work_dir or os.path.join(
        'work_dirs', os.path.splitext(os.path.basename(args.config))[0])
    cfg.dump(os.path.join(work_dir, 'config_dump.py')) if os.path.isdir(
        work_dir) else os.makedirs(work_dir, exist_ok=True)
    train_detector(cfg, work_dir, max_steps=args.max_steps)


if __name__ == '__main__':
    main()
