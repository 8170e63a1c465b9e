#!/usr/bin/env python
"""Model FLOPs/params via XLA's own cost analysis.

Parity: /root/reference/tools/analysis_tools/get_flops.py (mmcv flops
counter) — here the number comes from the compiled HLO, so it is exact for
the fused program rather than a per-module estimate.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from ld_tpu import Config
from ld_tpu.models import build_detector


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344])
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    det = build_detector(cfg.model)
    h, w = args.shape
    variables = det.init_variables(jax.random.PRNGKey(0), (1, h, w, 3))
    n_params = sum(x.size for x in
                   jax.tree_util.tree_leaves(variables['params']))

    fwd = jax.jit(lambda v, x: det.apply(v, x))
    lowered = fwd.lower(variables, jnp.zeros((1, h, w, 3)))
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan'))
    print(f'input shape: (1, {h}, {w}, 3)')
    print(f'params: {n_params / 1e6:.2f} M')
    print(f'flops (fwd, compiled): {flops / 1e9:.2f} GFLOPs')


if __name__ == '__main__':
    main()
