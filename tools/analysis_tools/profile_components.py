"""Component-level timing for the flagship inference path.

Times each stage (stem / res-stages / neck / head / decode+NMS) with a
device-side lax.scan loop and two-point K-vs-3K differencing (the only
reliable recipe under the axon tunnel — see docs/PERF.md).

Usage: python tools/analysis_tools/profile_components.py [--iters 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu import Config
from ld_tpu.models import build_detector
from ld_tpu.utils.profiling import setup_jax_cache

H, W = 800, 1344


def timed_scan(fn, x, iters):
    """Scan fn iters times on-device; return seconds per call."""

    import functools

    @functools.partial(jax.jit, static_argnums=(1, ))
    def loop(x, n_dummy):
        def body(carry, _):
            out = fn(carry)
            # data-dependence between iterations: perturb the first input
            # leaf by an invisible function of the output, else XLA hoists
            # the loop-invariant fn(carry) out of the scan entirely
            probe = sum(t.reshape(-1)[0].astype(jnp.float32)
                        for t in jax.tree_util.tree_leaves(out))
            leaves, treedef = jax.tree_util.tree_flatten(carry)
            leaves = [leaves[0] + (probe * 1e-30).astype(leaves[0].dtype)
                      ] + leaves[1:]
            return jax.tree_util.tree_unflatten(treedef, leaves), probe
        _, outs = jax.lax.scan(body, x, None, length=n_dummy)
        return outs.sum()

    def run(n):
        r = loop(x, n)
        np.asarray(jax.tree_util.tree_leaves(r)[0])   # sync warmup/compile
        start = time.perf_counter()
        r = loop(x, n)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        return time.perf_counter() - start

    t1 = run(iters)
    t2 = run(3 * iters)
    return (t2 - t1) / (2 * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=32)
    ap.add_argument('--batch', type=int, default=1)
    args = ap.parse_args()
    setup_jax_cache()

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        '..', '..')
    cfg = Config.fromfile(
        os.path.join(root, 'configs/gfl/gfl_r50_fpn_1x_coco.py'))
    mc = cfg.model.to_dict() if hasattr(cfg.model, 'to_dict') else dict(
        cfg.model)
    for k in ('backbone', 'neck', 'bbox_head'):
        mc[k]['dtype'] = jnp.bfloat16
    det = build_detector(mc)
    variables = det.init_variables(jax.random.PRNGKey(0),
                                   (args.batch, H, W, 3))
    img = jnp.asarray(np.random.RandomState(0).randn(
        args.batch, H, W, 3).astype(np.float32))
    hw = jnp.asarray([[H, W]] * args.batch, jnp.float32)

    # stage functions
    def full(x):
        return det.forward_test(variables, {'image': x, 'img_hw': hw})

    def backbone(x):
        return det.backbone.apply(
            {'params': variables['params']['backbone'],
             **{c: variables[c]['backbone'] for c in variables
                if c != 'params' and 'backbone' in variables[c]}}, x)

    feats = backbone(img)

    def neck_head(fs):
        nv = {'params': variables['params']['neck']}
        ns = det.neck.apply(nv, fs)
        hv = {'params': variables['params']['head_net']}
        return det.bbox_head.net.apply(hv, ns)

    outs = neck_head(feats)

    def decode(o):
        return det.bbox_head.get_bboxes(o, hw, rescale=False)

    rows = [
        ('full e2e', full, img),
        ('backbone', backbone, img),
        ('neck+head', neck_head, feats),
        ('decode+nms', decode, outs),
    ]
    for name, fn, x in rows:
        try:
            ms = timed_scan(fn, x, args.iters) * 1e3
            print(f'{name:12s} {ms:7.2f} ms')
        except Exception as e:  # noqa: BLE001
            print(f'{name:12s} FAILED: {type(e).__name__}: {e}')


if __name__ == '__main__':
    main()
