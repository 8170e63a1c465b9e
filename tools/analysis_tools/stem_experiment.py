"""Microbenchmark: ResNet stem 7x7/s2 conv vs space-to-depth reformulation.

The 7x7/s2 conv on a 3-channel image is a classic TPU inefficiency: the
contraction dim (7*7*3=147) and the tiny input channel count map poorly to
the MXU. The MLPerf-era fix: pad the kernel to 8x8 (zeros), then the s2 conv
is EXACTLY a 4x4/s1 conv on the space-to-depth-transformed input
(H/2, W/2, 12) with rearranged weights. This script measures both on the
real chip to decide whether to wire it into the backbone.

Usage: python tools/analysis_tools/stem_experiment.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.utils.profiling import setup_jax_cache

H, W = 800, 1344


def timed_scan(fn, x, iters=32):
    import functools

    @functools.partial(jax.jit, static_argnums=(1, ))
    def loop(x, n):
        def body(carry, _):
            out = fn(carry)
            probe = out.reshape(-1)[0].astype(jnp.float32)
            # iteration-to-iteration dependence so XLA cannot hoist fn
            return carry + (probe * 1e-30).astype(carry.dtype), probe
        _, outs = jax.lax.scan(body, x, None, length=n)
        return outs.sum()

    def run(n):
        np.asarray(loop(x, n))
        start = time.perf_counter()
        r = loop(x, n)
        np.asarray(r)
        return time.perf_counter() - start

    t1 = run(iters)
    t2 = run(3 * iters)
    return (t2 - t1) / (2 * iters)


def main():
    setup_jax_cache()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    w7 = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)

    dn = jax.lax.conv_dimension_numbers((1, H, W, 3), (7, 7, 3, 64),
                                        ('NHWC', 'HWIO', 'NHWC'))

    def stem_direct(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w7.astype(jnp.bfloat16),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=dn)
        return y

    # space-to-depth: pad kernel 7x7 -> 8x8 (one zero row/col at the FRONT so
    # that kernel tap (i, j) aligns with pixel offset (i-3, j-3) of the
    # padded-by-3 input; 8x8/s2 then factors exactly into 2x2 phases)
    w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    # input: pad 3 on top/left like the direct conv's padding=3, plus enough
    # on the bottom/right to cover the 8x8 window and /2 alignment
    def s2d(x):
        x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        return x

    # kernel in s2d space: (8,8,3,64) -> (4,4,12,64) with matching phase order
    w_s2d = w8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(4, 4, 12, 64)
    dn2 = jax.lax.conv_dimension_numbers((1, (H + 8) // 2, (W + 8) // 2, 12),
                                         (4, 4, 12, 64),
                                         ('NHWC', 'HWIO', 'NHWC'))

    def stem_s2d(x):
        xs = s2d(x)
        y = jax.lax.conv_general_dilated(
            xs.astype(jnp.bfloat16), w_s2d.astype(jnp.bfloat16),
            window_strides=(1, 1), padding='VALID',
            dimension_numbers=dn2)
        return y

    # correctness: compare fp32 versions
    def f32(fn, x):
        return np.asarray(fn(x).astype(jnp.float32))

    y_direct = np.asarray(jax.lax.conv_general_dilated(
        img, w7, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn))
    x_pad = jnp.pad(img, ((0, 0), (4, 4), (4, 4), (0, 0)))
    b, h, w, c = x_pad.shape
    xs = x_pad.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    y_s2d = np.asarray(jax.lax.conv_general_dilated(
        xs, w_s2d, (1, 1), 'VALID', dimension_numbers=dn2))
    # alignment: direct output pixel (i, j) reads input rows 2i-3..2i+3;
    # s2d output pixel (p, q) reads padded rows 2p-4..2p+3 => same when the
    # window starts line up; crop to the common region
    print('direct out', y_direct.shape, 's2d out', y_s2d.shape)
    crop = y_s2d[:, :y_direct.shape[1], :y_direct.shape[2], :]
    err = np.abs(crop - y_direct).max()
    print('max abs err (fp32):', err)

    t_direct = timed_scan(stem_direct, img) * 1e3
    t_s2d = timed_scan(stem_s2d, img) * 1e3
    print(f'direct 7x7/s2 : {t_direct:7.3f} ms')
    print(f's2d 4x4/s1    : {t_s2d:7.3f} ms')


if __name__ == '__main__':
    main()
