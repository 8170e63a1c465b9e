"""Batched-serving post-processing probe: which piece of multiclass_nms
stops scaling with batch?

Times (scan-carry, single host sync) the vmapped stages of
`ops.nms.multiclass_nms` on synthetic candidate tensors at several batch
sizes: the 400k-flat top-k candidate selection, the candidate gathers, the
NMS keep fixpoint, and the full call. Run on the real chip; the deltas
name the serving batch-scaling ceiling (docs/PERF.md, VERDICT r03 weak #5).
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

from ld_tpu.ops.nms import (_cluster_nms_keep, multiclass_nms,  # noqa: E402
                            topk_flat)

N, C, K = 5000, 80, 1024  # candidates per image, classes, NMS pool


def timed(fn, args, iters):
    """Two-point scan differencing; returns seconds per call."""
    @functools.partial(jax.jit, static_argnums=(1, ))
    def loop(a, n):
        def body(carry, _):
            out = fn(*[x + carry * 1e-9 if x.dtype.kind == 'f' else x
                       for x in a])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.asarray(leaf, jnp.float32).ravel()[0], None
        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    # under the axon tunnel block_until_ready is not a reliable barrier —
    # force a host transfer of the scan result instead (same recipe as
    # benchmark.py)
    float(loop(args, iters))      # compile + warm
    float(loop(args, 3 * iters))  # compile + warm
    t0 = time.perf_counter()
    float(loop(args, iters))
    t1 = time.perf_counter()
    float(loop(args, 3 * iters))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='+', default=[1, 8])
    ap.add_argument('--iters', type=int, default=16)
    args = ap.parse_args()

    rng = jax.random.PRNGKey(0)
    for b in args.batches:
        kb, ks, kc = jax.random.split(rng, 3)
        xy = jax.random.uniform(kb, (b, N, 2), jnp.float32, 0, 700)
        wh = jax.random.uniform(ks, (b, N, 2), jnp.float32, 8, 300)
        boxes = jnp.concatenate([xy, xy + wh], -1)
        scores = jax.random.uniform(kc, (b, N, C), jnp.float32) ** 4

        def stage_topk(bx, sc):
            flat = jnp.where(sc > 0.05, sc, 0.0).reshape(sc.shape[0], -1)
            return jax.vmap(lambda f: topk_flat(f, K))(flat)

        def stage_gather(bx, sc):
            tv, ti = stage_topk(bx, sc)
            anchor_idx = ti // C
            return jax.vmap(lambda bb, ai: bb[ai])(bx, anchor_idx), tv

        def stage_keep(bx, sc):
            cand, tv = stage_gather(bx, sc)
            return jax.vmap(lambda cb, v: _cluster_nms_keep(
                cb, None, 0.6, valid=v))(cand, tv > 0)

        def stage_full(bx, sc):
            return jax.vmap(lambda bb, ss: multiclass_nms(
                bb, ss, 0.05, 0.6, max_per_img=100))(bx, sc)

        print(f'batch {b}:')
        for name, fn in (('topk(N*C)', stage_topk),
                         ('+cand gathers', stage_gather),
                         ('+keep fixpoint', stage_keep),
                         ('full multiclass_nms', stage_full)):
            dt = timed(fn, (boxes, scores), args.iters)
            print(f'  {name:22s} {dt*1e3/b:7.3f} ms/img '
                  f'({dt*1e3:7.2f} ms/batch)', flush=True)


if __name__ == '__main__':
    main()
