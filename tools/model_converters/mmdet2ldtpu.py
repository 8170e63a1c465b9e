#!/usr/bin/env python
"""Convert an mmdet/torchvision .pth checkpoint to ld_tpu variables (.npz).

The published LD/GFL teacher checkpoints (README model zoo URLs) load
directly: mmdet {'state_dict': ...} wrapping, OIHW->HWIO kernel transpose,
BN running stats -> batch_stats, per-level Scale factors. Unmapped keys are
reported (and fail the conversion unless --allow-unmapped).

Usage:
    python tools/model_converters/mmdet2ldtpu.py teacher.pth teacher.npz \
        [--laterals 3] [--levels 5] [--allow-unmapped]

The .npz output is what configs' `teacher_ckpt` / tools/test.py expect for
non-.pth paths (train.py loads .pth directly through the same converter).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src', help='.pth checkpoint (mmdet or torchvision)')
    p.add_argument('dst', help='output .npz variables file')
    p.add_argument('--laterals', type=int, default=3,
                   help='FPN lateral conv count (in_channels entries)')
    p.add_argument('--levels', type=int, default=5,
                   help='head output levels (Scale count)')
    p.add_argument('--allow-unmapped', action='store_true')
    args = p.parse_args()

    from ld_tpu.utils.checkpoint import (load_torch_checkpoint,
                                         save_variables)
    variables = load_torch_checkpoint(args.src, strict=False,
                                      num_laterals=args.laterals,
                                      num_levels=args.levels)
    unmapped = variables.pop('_unmapped', [])
    if unmapped:
        print(f'{len(unmapped)} unmapped keys:', file=sys.stderr)
        for k in unmapped:
            print(f'  {k}', file=sys.stderr)
        if not args.allow_unmapped:
            sys.exit('conversion incomplete (use --allow-unmapped to force)')
    dst = args.dst if args.dst.endswith('.npz') else args.dst + '.npz'
    save_variables(dst, variables)
    n = sum(v.size for v in __import__('jax').tree_util.tree_leaves(
        variables['params']))
    print(f'wrote {dst}: {n/1e6:.2f}M params, '
          f'{len(unmapped)} unmapped keys')


if __name__ == '__main__':
    main()
