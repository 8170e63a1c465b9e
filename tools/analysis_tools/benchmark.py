#!/usr/bin/env python
"""Inference FPS benchmark for any config.

Parity: /root/reference/tools/analysis_tools/benchmark.py (single device,
timed loop over images, warmup skipped). Timing note: under the axon TPU
tunnel `block_until_ready` is not a reliable barrier, so throughput is
measured as a two-point difference with forced host transfers.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu import Config
from ld_tpu.models import build_detector


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344])
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--iters', type=int, default=32)
    p.add_argument('--fp32', action='store_true',
                   help='disable bf16 compute')
    p.add_argument('--fuse-conv-bn', action='store_true',
                   help='fold conv+BN (reference benchmark.py flag; '
                        'value-identical — on TPU XLA fuses eval BN '
                        'anyway, expect ~0 delta)')
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.model)
    if not args.fp32:
        for part in ('backbone', 'neck', 'bbox_head'):
            if part in model_cfg and model_cfg[part] is not None:
                model_cfg[part] = dict(model_cfg[part], dtype=jnp.bfloat16)
    det = build_detector(model_cfg)

    h, w = args.shape
    b = args.batch
    variables = det.init_variables(jax.random.PRNGKey(0), (1, h, w, 3))
    if args.fuse_conv_bn:
        from ld_tpu.utils.fuse_conv_bn import (fuse_conv_bn,
                                               fuse_conv_bn_cfg_ok)
        if fuse_conv_bn_cfg_ok(cfg.model):
            variables = fuse_conv_bn(variables)
        else:
            print('WARNING: --fuse-conv-bn skipped (ConvWS present)')
    batch = {
        'image': jnp.asarray(np.random.randn(b, h, w, 3).astype(np.float32)),
        'img_hw': jnp.asarray([[h, w]] * b, jnp.float32),
    }

    infer = jax.jit(lambda v, x: det.forward_test(v, x))

    def sync(out):
        return np.asarray(out[0][0, 0])

    sync(infer(variables, batch))  # compile + warmup

    def timed(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = infer(variables, batch)
        sync(out)
        return time.perf_counter() - t0

    t1 = timed(args.iters)
    t2 = timed(3 * args.iters)
    fps = b * 2 * args.iters / max(t2 - t1, 1e-9)
    print(f'config: {args.config}')
    print(f'shape: {b}x{h}x{w}  dtype: '
          f'{"fp32" if args.fp32 else "bf16"}')
    print(f'throughput: {fps:.2f} img/s '
          f'({1000.0 * b / fps:.2f} ms/batch)')


if __name__ == '__main__':
    main()
