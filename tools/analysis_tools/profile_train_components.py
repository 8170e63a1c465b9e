"""Train-step component breakdown: times fwd+bwd of progressively larger
slices of the GFL student (backbone -> +neck -> +head towers -> +real loss)
with the scan/two-point recipe, so the deltas attribute step time to each
component. Run on the real chip.

Usage: python tools/analysis_tools/profile_train_components.py [--batch 8]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

from ld_tpu.utils.profiling import setup_jax_cache  # noqa: E402

setup_jax_cache()

import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu import Config
from ld_tpu.models import build_detector


def timed(step, state, iters):
    @functools.partial(jax.jit, static_argnums=(1, ))
    def loop(state, n):
        def body(carry, _):
            return step(carry), None
        return jax.lax.scan(body, state, None, length=n)[0]

    jax.block_until_ready(loop(state, 2))  # compile both lengths
    jax.block_until_ready(loop(state, 3 * iters))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(state, iters))
    t1 = time.perf_counter()
    jax.block_until_ready(loop(state, 3 * iters))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--hw', type=int, nargs=2, default=(800, 1344))
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--config', default='configs/gfl/gfl_r50_fpn_1x_coco.py')
    args = ap.parse_args()

    cfg = Config.fromfile(args.config)
    det = build_detector(cfg.model)
    h, w = args.hw
    rng = jax.random.PRNGKey(0)
    variables = det.init_variables(rng, (1, h, w, 3))
    img = jax.random.uniform(rng, (args.batch, h, w, 3), jnp.float32)
    batch = dict(
        image=img,
        gt_bboxes=jnp.tile(jnp.array([[[40., 40., 400., 300.],
                                       [500., 200., 800., 600.]]]),
                           (args.batch, 1, 1)),
        gt_labels=jnp.ones((args.batch, 2), jnp.int32),
        gt_valid=jnp.ones((args.batch, 2), bool),
        img_hw=jnp.tile(jnp.array([[float(h), float(w)]]), (args.batch, 1)))

    bs = variables.get('batch_stats', {})

    def sgd(params, grads):
        return jax.tree_util.tree_map(lambda p, g: p - 1e-9 * g, params,
                                      grads)

    def bb_only(params):
        feats = det.extract_feat({'params': params, 'batch_stats': bs}, img,
                                 train=True)
        return sum(jnp.mean(f.astype(jnp.float32) ** 2) for f in feats)

    def bb_neck(params):
        feats = det.extract_feat({'params': params, 'batch_stats': bs}, img,
                                 train=True)
        feats = det.neck.apply({'params': params['neck']}, list(feats))
        return sum(jnp.mean(f.astype(jnp.float32) ** 2) for f in feats)

    def full_mse(params):
        outs = det.apply({'params': params, 'batch_stats': bs}, img,
                         train=True)
        return sum(jnp.mean(jnp.asarray(o).astype(jnp.float32) ** 2)
                   for lvl in outs for o in (lvl if isinstance(
                       lvl, (list, tuple)) else [lvl]))

    def full_loss(params):
        v = {'params': params, 'batch_stats': bs}
        losses = det.forward_train(v, batch)
        return sum(jnp.asarray(v) for k, v in losses.items()
                   if 'loss' in k)

    results = {}
    for name, fn in (('backbone', bb_only), ('backbone+neck', bb_neck),
                     ('+head_towers(mse)', full_mse),
                     ('full step(real loss)', full_loss)):
        def step(params, fn=fn):
            return sgd(params, jax.grad(fn)(params))
        dt = timed(step, variables['params'], args.iters)
        results[name] = dt * 1e3
        print(f'{name:24s} fwd+bwd+sgd: {dt*1e3:8.1f} ms', flush=True)

    print()
    prev = 0.0
    for name, ms in results.items():
        print(f'{name:24s} delta: {ms - prev:8.1f} ms')
        prev = ms


if __name__ == '__main__':
    main()
