"""Anchor generator golden-value tests (GFL configuration)."""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import numpy as np
import jax.numpy as jnp

from ld_tpu.ops import AnchorGenerator, integral


def _gfl_generator():
    # configs/gfl/*: ratios=[1.0], octave_base_scale=8, scales_per_octave=1
    return AnchorGenerator(strides=[8, 16, 32, 64, 128], ratios=[1.0],
                           octave_base_scale=8, scales_per_octave=1)


def test_base_anchors_golden():
    gen = _gfl_generator()
    # level 0: base size 8, scale 8 -> 64x64 box centred at (0, 0)
    np.testing.assert_allclose(gen.base_anchors[0][0], [-32, -32, 32, 32])
    np.testing.assert_allclose(gen.base_anchors[2][0], [-128, -128, 128, 128])
    assert gen.num_base_anchors == [1] * 5


def test_grid_anchor_positions():
    gen = _gfl_generator()
    anchors = gen.grid_anchors([(4, 6), (2, 3), (1, 2), (1, 1), (1, 1)])
    a0 = np.asarray(anchors[0])
    assert a0.shape == (24, 4)
    # row-major: anchor at grid (i=1, j=2) is index 1*6+2, centred (16, 8)
    np.testing.assert_allclose(a0[8], [16 - 32, 8 - 32, 16 + 32, 8 + 32])
    # second level at stride 16
    a1 = np.asarray(anchors[1])
    np.testing.assert_allclose(a1[1][:2], [16 - 64, -64])


def test_multi_scale_ratio_anchors():
    gen = AnchorGenerator(strides=[4], ratios=[0.5, 1.0, 2.0],
                          octave_base_scale=4, scales_per_octave=3)
    assert gen.num_base_anchors == [9]
    base = np.asarray(gen.base_anchors[0])
    ws = base[:, 2] - base[:, 0]
    hs = base[:, 3] - base[:, 1]
    # ratio blocks: first 3 anchors have h/w = 0.5
    np.testing.assert_allclose(hs[:3] / ws[:3], 0.5, rtol=1e-5)
    np.testing.assert_allclose(hs[3:6] / ws[3:6], 1.0, rtol=1e-5)
    # scales within a block are 4 * 2^(i/3)
    np.testing.assert_allclose(ws[3:6] / 4.0,
                               [4 * 2**(i / 3) for i in range(3)], rtol=1e-5)


def test_valid_flags():
    gen = _gfl_generator()
    featmaps = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    # image 50x33 inside a 64x64-padded batch: ceil(33/8)=5 valid cols
    flags = gen.valid_flags(featmaps, (50, 33))
    f0 = np.asarray(flags[0]).reshape(8, 8)
    assert f0[:7, :5].all()
    assert not f0[:, 5:].any()
    assert not f0[7, :].any()


def test_integral_decode():
    # uniform distribution -> expectation reg_max/2
    x = jnp.zeros((3, 4 * 17))
    out = np.asarray(integral(x, reg_max=16))
    np.testing.assert_allclose(out, 8.0, rtol=1e-5)
    # sharp peak at bin k -> k
    logits = np.zeros((1, 4, 17), np.float32)
    logits[0, :, 5] = 30.0
    out = np.asarray(integral(jnp.asarray(logits.reshape(1, -1)), 16))
    np.testing.assert_allclose(out, 5.0, atol=1e-3)
