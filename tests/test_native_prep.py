"""Native fused preprocessing vs the separate cv2 transforms."""
import numpy as np
import pytest

from ld_tpu.data.transforms import (Compose, FusedPreprocess, Normalize,
                                    Pad, Resize)
from ld_tpu.native.build import load_imageprep


@pytest.mark.skipif(load_imageprep() is None, reason='native lib unavailable')
def test_fused_matches_separate():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 147, 3)).astype(np.uint8)
    base = dict(img=img, img_shape=img.shape, ori_shape=img.shape,
                gt_bboxes=np.asarray([[10., 20., 60., 80.]], np.float32),
                gt_labels=np.asarray([1]))

    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    fused = FusedPreprocess(img_scale=(256, 160), mean=mean, std=std)
    sep = Compose([
        Resize(img_scale=(256, 160), keep_ratio=True),
        Normalize(mean, std, to_rgb=True),
        Pad(size_divisor=32),
    ])

    a = fused({**base, 'img': img.copy(),
               'gt_bboxes': base['gt_bboxes'].copy()})
    b = sep({**base, 'img': img.copy(),
             'gt_bboxes': base['gt_bboxes'].copy()})
    assert a['img'].shape == b['img'].shape
    np.testing.assert_allclose(a['scale_factor'], b['scale_factor'])
    np.testing.assert_allclose(a['gt_bboxes'], b['gt_bboxes'], rtol=1e-5)
    # bilinear sampling: allow small interpolation differences vs cv2
    diff = np.abs(a['img'] - b['img'])
    assert np.median(diff) < 0.02, float(np.median(diff))
    assert np.mean(diff) < 0.05, float(np.mean(diff))


@pytest.mark.skipif(load_imageprep() is None, reason='native lib unavailable')
def test_fused_padding_zero():
    img = np.full((50, 70, 3), 200, np.uint8)
    fused = FusedPreprocess(img_scale=(128, 96), mean=[0, 0, 0],
                            std=[1, 1, 1])
    out = fused(dict(img=img, img_shape=img.shape, ori_shape=img.shape))
    nh, nw = out['img_shape'][:2]
    assert (out['img'][nh:] == 0).all()
    assert (out['img'][:, nw:] == 0).all()
    assert abs(float(out['img'][:nh, :nw].mean()) - 200) < 1.0
