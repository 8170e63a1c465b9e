"""inference_detector / async_inference_detector API tests.

Parity: /root/reference/mmdet/apis/inference.py:83,149 and
/root/reference/tests/test_async.py (concurrent asyncio inference).
"""
import asyncio

import jax
import numpy as np

from ld_tpu.apis import async_inference_detector
from ld_tpu.apis.inference import inference_detector
from ld_tpu.models import build_detector


def _tiny_detector():
    cfg = dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(
            type='GFLHead', num_classes=4, in_channels=32, stacked_convs=1,
            feat_channels=32,
            anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                  octave_base_scale=8, scales_per_octave=1,
                                  strides=[8, 16, 32, 64, 128]),
            loss_cls=dict(type='QualityFocalLoss', use_sigmoid=True,
                          beta=2.0, loss_weight=1.0),
            loss_bbox=dict(type='GIoULoss', loss_weight=2.0)),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9),
                       allowed_border=-1, pos_weight=-1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))
    det = build_detector(cfg)
    return det, det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))


def test_inference_detector_returns_original_coords():
    det, variables = _tiny_detector()
    img = (np.random.RandomState(0).rand(50, 70, 3) * 255).astype(np.uint8)
    out = inference_detector(det, variables, img, pad_hw=(64, 96),
                             img_scale=(96, 64))
    assert set(out) >= {'boxes', 'labels'}
    boxes = out['boxes']
    assert boxes.ndim == 2 and boxes.shape[1] == 5
    if len(boxes):
        # rescaled back to the 50x70 original frame
        assert boxes[:, [0, 2]].max() <= 70 + 1e-3
        assert boxes[:, [1, 3]].max() <= 50 + 1e-3


def test_async_inference_matches_sync_and_runs_concurrently():
    det, variables = _tiny_detector()
    rs = np.random.RandomState(1)
    imgs = [(rs.rand(50, 70, 3) * 255).astype(np.uint8) for _ in range(3)]

    sync = [inference_detector(det, variables, im, pad_hw=(64, 96),
                               img_scale=(96, 64)) for im in imgs]

    async def run_all():
        return await asyncio.gather(*[
            async_inference_detector(det, variables, im, pad_hw=(64, 96),
                                     img_scale=(96, 64)) for im in imgs])

    got = asyncio.run(run_all())
    for s, g in zip(sync, got):
        np.testing.assert_allclose(s['boxes'], g['boxes'], rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_array_equal(s['labels'], g['labels'])
