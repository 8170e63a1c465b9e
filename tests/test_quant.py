"""int8 PTQ serving path (ld_tpu/ops/quant.py).

Contracts:
  1. Dequant algebra is EXACT when inputs/weights sit on the quant grid —
     pins scales, rounding, int32 accumulation, bias, and layout plumbing.
  2. On off-grid data the int8 conv's error is bounded by the quantization
     ulp (amax/127 per tensor element, accumulated over the receptive
     field) — catches wrong-axis scale bugs that stay "roughly right".
  3. The interceptor quantizes ONLY calibrated, non-skipped plain nn.Conv
     calls: skip-listed paths and subclassed convs run the fp path
     bit-identically.
  4. End-to-end: a GFL detector's forward_test runs under jit with every
     backbone/neck/tower conv in int8 and emits finite, in-bounds boxes.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ld_tpu  # noqa: F401
from ld_tpu.ops import quant


class TwoConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(8, (3, 3), name='c1')(x))
        return nn.Conv(4, (1, 1), name='gfl_cls')(x)


def _on_grid(rng, shape, amax, n=127, pin_axis=None):
    """Values exactly representable as k * (amax/n), |k| <= n.

    pin_axis: force one |k|=n element per slice of that trailing axis, so
    the per-channel requantization scale is exactly amax/n and the grid
    round-trips losslessly (otherwise kmax<n makes the scale non-integral
    on the grid).
    """
    k = jax.random.randint(rng, shape, -n, n + 1)
    if pin_axis is not None:
        flat = k.reshape(-1, shape[-1])
        k = flat.at[0, :].set(n).reshape(shape)
    return k.astype(jnp.float32) * (amax / n)


def test_quantized_conv_exact_on_grid():
    rng = jax.random.PRNGKey(0)
    m = TwoConv()
    v = m.init(rng, jnp.ones((1, 8, 8, 3)))
    # weights on each c_out's own grid: scale by column max after rounding
    kern = _on_grid(jax.random.fold_in(rng, 1), (3, 3, 3, 8), 0.5,
                    pin_axis=-1)
    v = jax.tree_util.tree_map(lambda x: x, v)
    v['params']['c1']['kernel'] = kern
    x = _on_grid(jax.random.fold_in(rng, 2), (2, 8, 8, 3), 2.0)
    x = x.at[0, 0, 0, 0].set(2.0)  # pin the activation amax to the grid max

    def fwd(variables, x):
        return m.apply(variables, x)

    amax = quant.calibrate(fwd, v, [x], skip=('gfl_cls', ))
    key = [k for k in amax if k.startswith('c1')][0]
    # calibrated amax == the exact grid max -> requantization is lossless
    assert np.isclose(amax[key], float(jnp.max(jnp.abs(x))), rtol=1e-6)

    ref = fwd(v, x)
    got = jax.jit(quant.int8_forward(fwd, amax, skip=('gfl_cls', )))(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quantized_conv_error_bounded_off_grid():
    rng = jax.random.PRNGKey(3)
    m = TwoConv()
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 16, 3))
    v = m.init(rng, x)

    def fwd(variables, x):
        return m.apply(variables, x)

    amax = quant.calibrate(fwd, v, [x], skip=('gfl_cls', ))
    ref = np.asarray(fwd(v, x))
    got = np.asarray(quant.int8_forward(fwd, amax, skip=('gfl_cls', ))(v, x))
    # per-element quant noise ~ ulp * sqrt(fan_in); a generous analytic
    # bound that wrong-axis or wrong-layout scaling blows past by 10-100x
    kernel = np.asarray(v['params']['c1']['kernel'])
    fan_in = 3 * 3 * 3
    ulp_x = float(np.abs(np.asarray(x)).max()) / 127
    bound = ulp_x * np.abs(kernel).sum(axis=(0, 1, 2)).max() \
        + np.abs(kernel).max() / 127 * float(np.abs(np.asarray(x)).mean()) \
        * fan_in
    err = np.abs(got - ref).max()
    assert err < bound, (err, bound)
    # and it must actually correlate (not be garbage)
    cc = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert cc > 0.999


def test_skip_list_and_uncalibrated_fall_back_fp():
    rng = jax.random.PRNGKey(4)
    m = TwoConv()
    x = jax.random.normal(rng, (1, 8, 8, 3))
    v = m.init(rng, x)

    def fwd(variables, x):
        return m.apply(variables, x)

    # only c1 calibrated; gfl_cls skipped -> with an EMPTY amax dict the
    # whole forward must be bit-identical to fp
    ref = np.asarray(fwd(v, x))
    got = np.asarray(quant.int8_forward(fwd, {}, skip=())(v, x))
    np.testing.assert_array_equal(got, ref)
    # gfl_cls in the skip list never gets a calibration record
    amax = quant.calibrate(fwd, v, [x])
    assert not any('gfl_cls' in k for k in amax)
    assert any(k.startswith('c1') for k in amax)


def test_default_skip_covers_prediction_heads():
    for name in ('gfl_cls', 'retina_reg', 'rpn_cls', 'reg_conf'):
        assert any(s in name for s in quant.DEFAULT_SKIP), name


def test_detector_int8_forward_end_to_end():
    from ld_tpu.models import build_detector
    model = dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), base_channels=16,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='GFLHead', num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=2, reg_max=8,
                       anchor_generator=dict(
                           type='AnchorGenerator', ratios=[1.0],
                           octave_base_scale=8, scales_per_octave=1,
                           strides=[8, 16, 32, 64, 128])),
        test_cfg=dict(nms_pre=100, score_thr=0.0,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=20))
    det = build_detector(model)
    rng = jax.random.PRNGKey(0)
    variables = det.init_variables(rng, (1, 64, 96, 3))
    img = jax.random.uniform(rng, (1, 64, 96, 3), jnp.float32)
    batch = dict(image=img,
                 img_hw=jnp.array([[64.0, 96.0]]),
                 scale_factor=jnp.ones((1, 4)))

    def fwd(variables, batch):
        return det.forward_test(variables, batch, rescale=False)

    amax = quant.calibrate(lambda v, b: fwd(v, b), variables, [batch])
    # every tower/backbone conv got a record; prediction convs none
    assert len(amax) >= 10
    dets, labels, valid = jax.jit(
        quant.int8_forward(fwd, amax))(variables, batch)
    d = np.asarray(dets)
    assert np.isfinite(d).all()
    assert (np.asarray(valid).sum() >= 0)
    # fp and int8 paths agree on the top-scoring box's location coarsely
    ref_dets, ref_labels, ref_valid = jax.jit(fwd)(variables, batch)
    rd = np.asarray(ref_dets)
    if np.asarray(ref_valid).any() and np.asarray(valid).any():
        np.testing.assert_allclose(d[0, 0, :4], rd[0, 0, :4], atol=8.0)
