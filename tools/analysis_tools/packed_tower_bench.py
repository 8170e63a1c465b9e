"""Microbenchmark: packed vs per-level GFL head tower at train shapes.

Times ONLY the head net (4+4 conv-GN tower + prediction convs), forward
and forward+backward, on the real chip with the scan-carry two-point
recipe (docs/PERF.md). Localizes the packed-canvas regression seen in the
full-step benchmark.

Usage: python tools/analysis_tools/packed_tower_bench.py [--hw 800 1344]
       [--batch 8] [--channels 256] [--dtype bf16|fp32] [--k 8]
"""
import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--hw', type=int, nargs=2, default=(800, 1344))
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--channels', type=int, default=256)
    ap.add_argument('--dtype', default='fp32', choices=['bf16', 'fp32'])
    ap.add_argument('--k', type=int, default=8)
    args = ap.parse_args()

    from ld_tpu.utils.profiling import setup_jax_cache
    setup_jax_cache()
    from ld_tpu.models.heads.gfl_head import GFLHeadNet
    from ld_tpu.models.heads.packed_tower import PackedGFLHeadNet

    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    H, W = args.hw
    sizes = [(max(1, -(-H // (8 * 2 ** i))), max(1, -(-W // (8 * 2 ** i))))
             for i in range(5)]
    feats = [jnp.asarray(np.random.RandomState(i).randn(
        args.batch, h, w, args.channels).astype(np.float32), dtype)
        for i, (h, w) in enumerate(sizes)]

    kw = dict(num_classes=80, feat_channels=args.channels, stacked_convs=4,
              reg_max=16, num_levels=5, dtype=dtype)
    nets = {'per-level': GFLHeadNet(**kw), 'packed': PackedGFLHeadNet(**kw)}
    variables = nets['per-level'].init(jax.random.PRNGKey(0), feats)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]

    for name, net in nets.items():
        def fwd_loss(params, f0):
            cls, reg = net.apply({'params': params}, [f0] + feats[1:])
            return (sum(jnp.sum(c.astype(jnp.float32) ** 2) for c in cls) +
                    sum(jnp.sum(r.astype(jnp.float32) ** 2) for r in reg))

        def _dep(f0, c):
            # force iteration data-dependence without promoting f0's dtype
            return f0 + (0 * c).astype(f0.dtype)

        @partial(jax.jit, static_argnums=2)
        def scan_fwd(params, f0, k):
            def body(c, _):
                return c + fwd_loss(params, _dep(f0, c)), None
            return jax.lax.scan(body, jnp.float32(0), None, length=k)[0]

        @partial(jax.jit, static_argnums=2)
        def scan_bwd(params, f0, k):
            g = jax.grad(fwd_loss, argnums=1)

            def body(c, _):
                return c + jnp.sum(g(params, _dep(f0, c))
                                   .astype(jnp.float32)), None
            return jax.lax.scan(body, jnp.float32(0), None, length=k)[0]

        for tag, fn in (('fwd', scan_fwd), ('fwd+bwd', scan_bwd)):
            # compile BOTH static scan lengths before timing
            sync(fn(variables['params'], feats[0], args.k))
            sync(fn(variables['params'], feats[0], 3 * args.k))
            t0 = time.perf_counter()
            sync(fn(variables['params'], feats[0], args.k))
            t1 = time.perf_counter()
            sync(fn(variables['params'], feats[0], 3 * args.k))
            t2 = time.perf_counter()
            ms = ((t2 - t1) - (t1 - t0)) / (2 * args.k) * 1e3
            print(f'{name:10s} {tag:8s} {ms:8.2f} ms/call '
                  f'(batch {args.batch} {H}x{W} {args.dtype})')


if __name__ == '__main__':
    main()
