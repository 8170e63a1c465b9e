"""Misc inherited-stack components: losses, wrappers, SSD augs, TBLR coder."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ld_tpu
from ld_tpu import LOSSES
from ld_tpu.data import (ClassBalancedDataset, ConcatDataset, RepeatDataset,
                         SyntheticDetectionDataset)
from ld_tpu.data.transforms import (CutOut, Expand, MinIoURandomCrop,
                                    RandomCrop)
from ld_tpu.ops.coder import build_coder

RNG = np.random.RandomState(0)


def test_new_losses_finite_and_weighted():
    p = jnp.asarray(RNG.randn(12, 6).astype(np.float32))
    t = jnp.asarray(np.abs(RNG.rand(12, 6)).astype(np.float32))
    for name in ('VarifocalLoss', 'GaussianFocalLoss'):
        loss = LOSSES.build(dict(type=name))
        arg = jax.nn.sigmoid(p) if name == 'GaussianFocalLoss' else p
        v = float(loss(arg, t))
        assert np.isfinite(v) and v > 0, name
    bl1 = LOSSES.build(dict(type='BalancedL1Loss', loss_weight=2.0))
    v1 = float(bl1(p, t))
    v2 = float(LOSSES.build(dict(type='BalancedL1Loss'))(p, t))
    assert abs(v1 - 2 * v2) < 1e-5
    mse = LOSSES.build(dict(type='MSELoss'))
    assert abs(float(mse(p, p))) < 1e-8


def test_bounded_iou_zero_for_identical():
    b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 9., 12.]])
    loss = LOSSES.build(dict(type='BoundedIoULoss'))
    assert abs(float(loss(b, b))) < 1e-6


def test_tblr_coder_roundtrip():
    coder = build_coder(dict(type='TBLRBBoxCoder', normalizer=4.0))
    anchors = jnp.asarray(RNG.uniform(0, 50, (7, 2)).astype(np.float32))
    anchors = jnp.concatenate([anchors, anchors + 20], -1)
    gts = anchors + jnp.asarray(RNG.uniform(-5, 5, (7, 4)).astype(np.float32))
    deltas = coder.encode(anchors, gts)
    back = coder.decode(anchors, deltas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gts), atol=1e-3)


def test_dataset_wrappers():
    ds = SyntheticDetectionDataset(num_images=6, hw=(32, 32), pipeline=[])
    assert len(RepeatDataset(ds, 3)) == 18
    c = ConcatDataset([ds, ds])
    assert len(c) == 12
    assert c.get_ann_info(7)['bboxes'].shape == \
        ds.get_ann_info(1)['bboxes'].shape
    cb = ClassBalancedDataset(ds, oversample_thr=0.5)
    assert len(cb) >= len(ds)


def _sample():
    img = RNG.randint(0, 255, (60, 80, 3)).astype(np.uint8)
    return dict(img=img, img_shape=img.shape, ori_shape=img.shape,
                gt_bboxes=np.asarray([[10., 10., 40., 40.]], np.float32),
                gt_labels=np.asarray([1]))


def test_random_crop():
    np.random.seed(0)
    out = RandomCrop(crop_size=(40, 50))(_sample())
    assert out is None or out['img'].shape[:2] == (40, 50)


def test_expand_keeps_boxes_on_image():
    np.random.seed(0)
    out = Expand(prob=1.0, ratio_range=(2, 2))(_sample())
    assert out['img'].shape[:2] == (120, 160)
    b = out['gt_bboxes'][0]
    assert 0 <= b[0] < b[2] <= 160 and 0 <= b[1] < b[3] <= 120


def test_min_iou_crop_preserves_some_box():
    np.random.seed(3)
    out = MinIoURandomCrop()(_sample())
    assert len(out['gt_bboxes']) >= 0
    assert out['img'].ndim == 3


def test_cutout():
    np.random.seed(0)
    out = CutOut(n_holes=2, cutout_shape=(8, 8))(_sample())
    assert out['img'].shape == (60, 80, 3)


def test_ghmr_loss():
    p = jnp.asarray(RNG.randn(10, 4).astype(np.float32))
    t = jnp.asarray(RNG.randn(10, 4).astype(np.float32))
    ghmr = LOSSES.build(dict(type='GHMR'))
    v = float(ghmr(p, t))
    assert np.isfinite(v) and v > 0
    assert abs(float(ghmr(p, p))) < 1e-6
