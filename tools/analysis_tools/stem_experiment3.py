"""Stem deep-dive round 3: make the s2d transform cheap, or avoid it.

Variants:
  a2. s2d transform, cast to bf16 FIRST (half the bytes moved)
  a3. s2d via 4 strided slices + concat (bf16 first)
  e2. direct 8x8/s2 conv (front-zero-padded kernel, no input transform)
  h.  full stem direct, all-bf16 epilogue (scale/relu/maxpool in bf16)
  i.  full stem with bf16-first s2d transform
  j.  separable maxpool (3x1 then 1x3) on bf16
  k.  full stem, 8x8 kernel + all-bf16 epilogue
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ld_tpu.utils.profiling import setup_jax_cache

H, W = 800, 1344


def timed_scan(fn, x, iters=32):

    @functools.partial(jax.jit, static_argnums=(1, ))
    def loop(x, n):
        def body(carry, _):
            out = fn(carry)
            probe = out.reshape(-1)[0].astype(jnp.float32)
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
    w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w_s2d = w8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(4, 4, 12, 64)
    wb = w_s2d.astype(jnp.bfloat16)
    w8b = w8.astype(jnp.bfloat16)
    w7b = w7.astype(jnp.bfloat16)
    scale = jnp.asarray(rng.rand(64).astype(np.float32))
    bias = jnp.asarray(rng.rand(64).astype(np.float32))
    scale_b = scale.astype(jnp.bfloat16)
    bias_b = bias.astype(jnp.bfloat16)

    def a2_transform(x):
        x = x.astype(jnp.bfloat16)
        x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                     4 * c)

    def a3_transform(x):
        x = x.astype(jnp.bfloat16)
        x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        # channel layout (r_h, r_w, c) to match wb
        parts = [x[:, i::2, j::2, :] for i in range(2) for j in range(2)]
        return jnp.concatenate(parts, axis=-1)

    dn8 = jax.lax.conv_dimension_numbers((1, H, W, 3), (8, 8, 3, 64),
                                         ('NHWC', 'HWIO', 'NHWC'))

    def e2_direct8(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w8b, (2, 2), [(4, 3), (4, 3)],
            dimension_numbers=dn8)

    dn = jax.lax.conv_dimension_numbers((1, H, W, 3), (7, 7, 3, 64),
                                        ('NHWC', 'HWIO', 'NHWC'))

    def direct7(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w7b, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn)

    def h_full_bf16(x):
        y = direct7(x)
        y = jax.nn.relu(y * scale_b + bias_b)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

    xs_shape = (1, (H + 8) // 2, (W + 8) // 2, 12)
    dn2 = jax.lax.conv_dimension_numbers(xs_shape, (4, 4, 12, 64),
                                         ('NHWC', 'HWIO', 'NHWC'))

    def i_full_s2d(x):
        xs = a3_transform(x)
        y = jax.lax.conv_general_dilated(xs, wb, (1, 1), 'VALID',
                                         dimension_numbers=dn2)
        y = y[:, :H // 2, :W // 2, :]
        y = jax.nn.relu(y * scale_b + bias_b)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

    y64 = jnp.asarray(rng.randn(1, 400, 672, 64).astype(np.float32)) \
        .astype(jnp.bfloat16)

    def j_sep_pool(y):
        y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 1, 1),
                                  (1, 2, 1, 1), [(0, 0), (1, 1), (0, 0),
                                                 (0, 0)])
        return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 1, 3, 1),
                                     (1, 1, 2, 1), [(0, 0), (0, 0), (1, 1),
                                                    (0, 0)])

    def j2_pool(y):
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

    def k_full_8(x):
        y = e2_direct8(x)
        y = jax.nn.relu(y * scale_b + bias_b)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

    # correctness spot checks (fp32 paths)
    ya = np.asarray(a2_transform(img).astype(jnp.float32))
    yb = np.asarray(a3_transform(img).astype(jnp.float32))
    print('a2 vs a3 max err:', np.abs(ya - yb).max())
    y7 = np.asarray(direct7(img).astype(jnp.float32))
    y8 = np.asarray(e2_direct8(img).astype(jnp.float32))
    print('7x7 vs 8x8 max err:', np.abs(y7 - y8).max())

    rows = [
        ('a2 s2d bf16-first', a2_transform, img),
        ('a3 s2d slices bf16', a3_transform, img),
        ('e2 direct 8x8/s2', e2_direct8, img),
        ('h full stem bf16', h_full_bf16, img),
        ('i full stem s2d-a3', i_full_s2d, img),
        ('j sep maxpool', j_sep_pool, y64),
        ('j2 window maxpool', j2_pool, y64),
        ('k full stem 8x8 bf16', k_full_8, img),
    ]
    for name, fn, x in rows:
        try:
            ms = timed_scan(fn, x) * 1e3
            print(f'{name:24s} {ms:7.3f} ms')
        except Exception as ex:  # noqa: BLE001
            print(f'{name:24s} FAILED {type(ex).__name__}: {ex}')


if __name__ == '__main__':
    main()
