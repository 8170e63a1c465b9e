"""TTA (multi-scale + flip) merged inference test."""
import numpy as np
import jax

import ld_tpu
from ld_tpu.apis.aug_test import aug_test, build_aug_views
from ld_tpu.models import build_detector


def test_aug_test_runs_and_merges():
    cfg = dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='GFLHead', num_classes=4, in_channels=32,
                       stacked_convs=1, feat_channels=32, reg_max=16),
        test_cfg=dict(nms_pre=100, score_thr=1e-4,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=20))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (80, 120, 3)).astype(np.uint8)
    views = build_aug_views(img, img_scales=[(96, 64), (128, 96)], flip=True,
                            mean=[0, 0, 0], std=[64, 64, 64], to_rgb=True)
    assert len(views) == 4  # 2 scales x (orig + flip)
    out = aug_test(det, v, views, ori_hw=img.shape[:2])
    assert out['boxes'].shape[1] == 5
    # merged detections stay inside the original image bounds
    if len(out['boxes']):
        assert out['boxes'][:, 0].min() >= -1
        assert out['boxes'][:, 2].max() <= 120 + 1
        assert out['boxes'][:, 3].max() <= 80 + 1
