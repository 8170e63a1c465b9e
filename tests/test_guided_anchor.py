"""Guided anchoring: loc/shape/cls/reg branches train + infer."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector
from ld_tpu.models.heads.guided_anchor_head import calc_region


def test_calc_region_shrinks():
    boxes = jnp.asarray([[2., 2., 10., 10.]])
    x1, y1, x2, y2 = calc_region(boxes, 0.5, 16, 16)
    assert float(x1[0]) == 4.0 and float(x2[0]) == 8.0
    assert float(y1[0]) == 4.0 and float(y2[0]) == 8.0


def test_ga_retina_train_and_infer():
    rs = np.random.RandomState(0)
    B, G = 1, 4
    gt = np.zeros((B, G, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    gt[:, 1] = [20, 16, 56, 60]
    valid = np.zeros((B, G), bool)
    valid[:, :2] = True
    batch = dict(
        image=jnp.asarray(rs.randn(B, 64, 64, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
        gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64., 64.]] * B))
    cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='GARetinaHead', num_classes=6, in_channels=32,
                       stacked_convs=1, feat_channels=32),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 64, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_shape',
                           'loss_loc'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_loc']) > 0
    assert float(losses['loss_shape']) > 0
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (B, 10, 5)
