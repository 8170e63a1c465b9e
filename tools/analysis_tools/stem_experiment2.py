"""Stem deep-dive: where does the 7x7/s2 stem's time actually go?

Variants measured on the real chip:
  a. s2d transform alone (pad + reshape + transpose)
  b. 4x4/s1 conv alone on a pre-transformed input
  c. im2col matmul formulation of (b)
  d. s2d conv with output channels padded 64->128 (full MXU lane)
  e. direct conv fp32 in / bf16 out (baseline recheck)
  f. stem + BN-scale-bias + relu + maxpool fused (the real stem block)
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

    def s2d(x):
        x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                     4 * c)

    xs_const = s2d(img).astype(jnp.bfloat16)          # (1, 404, 676, 12)
    hs, ws = xs_const.shape[1], xs_const.shape[2]
    dn2 = jax.lax.conv_dimension_numbers(xs_const.shape, (4, 4, 12, 64),
                                         ('NHWC', 'HWIO', 'NHWC'))

    wb = w_s2d.astype(jnp.bfloat16)

    def a_transform(x):
        return s2d(x).astype(jnp.bfloat16)

    def b_conv(xs):
        return jax.lax.conv_general_dilated(xs, wb, (1, 1), 'VALID',
                                            dimension_numbers=dn2)

    # im2col: 16 shifted slices concatenated on channels -> one matmul
    w_mat = wb.reshape(16 * 12, 64)

    def c_im2col(xs):
        oh, ow = hs - 3, ws - 3
        cols = [xs[:, i:i + oh, j:j + ow, :] for i in range(4)
                for j in range(4)]
        patch = jnp.concatenate(cols, axis=-1)        # (1, oh, ow, 192)
        return jax.lax.dot_general(
            patch.reshape(-1, 192), w_mat, (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.bfloat16).reshape(1, oh, ow, 64)

    wb128 = jnp.pad(wb, ((0, 0), (0, 0), (0, 0), (0, 64)))
    dn128 = jax.lax.conv_dimension_numbers(xs_const.shape, (4, 4, 12, 128),
                                           ('NHWC', 'HWIO', 'NHWC'))

    def d_pad128(xs):
        y = jax.lax.conv_general_dilated(xs, wb128, (1, 1), 'VALID',
                                         dimension_numbers=dn128)
        return y[..., :64]

    dn = jax.lax.conv_dimension_numbers((1, H, W, 3), (7, 7, 3, 64),
                                        ('NHWC', 'HWIO', 'NHWC'))
    w7b = w7.astype(jnp.bfloat16)

    def e_direct(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w7b, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn)

    scale = jnp.asarray(rng.rand(64).astype(np.float32))
    bias = jnp.asarray(rng.rand(64).astype(np.float32))

    def f_full_stem(x):
        y = e_direct(x).astype(jnp.float32)
        y = jax.nn.relu(y * scale + bias)
        import flax.linen as nn
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

    def g_full_stem_s2d(x):
        y = b_conv(a_transform(x)).astype(jnp.float32)
        y = y[:, :400, :672, :]
        y = jax.nn.relu(y * scale + bias)
        import flax.linen as nn
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

    rows = [
        ('a s2d transform only', a_transform, img),
        ('b conv on pre-s2d', b_conv, xs_const),
        ('c im2col matmul', c_im2col, xs_const),
        ('d conv out-padded 128', d_pad128, xs_const),
        ('e direct 7x7/s2', e_direct, img),
        ('f full stem direct', f_full_stem, img),
        ('g full stem s2d', g_full_stem_s2d, img),
    ]
    for name, fn, x in rows:
        try:
            ms = timed_scan(fn, x) * 1e3
            print(f'{name:24s} {ms:7.3f} ms')
        except Exception as ex:  # noqa: BLE001
            print(f'{name:24s} FAILED {type(ex).__name__}: {ex}')


if __name__ == '__main__':
    main()
