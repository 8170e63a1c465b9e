"""Grid R-CNN + PointRend ROI heads."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector

rs = np.random.RandomState(0)
B, G = 1, 4
H, W = 64, 64
gt = np.zeros((B, G, 4), np.float32)
gt[:, 0] = [8, 8, 40, 48]
gt[:, 1] = [20, 16, 56, 60]
valid = np.zeros((B, G), bool)
valid[:, :2] = True
masks = np.zeros((B, G, H // 4, W // 4), np.float32)
for g in range(2):
    x1, y1, x2, y2 = (gt[0, g] / 4).astype(int)
    masks[0, g, y1:y2, x1:x2] = 1.0
batch = dict(image=jnp.asarray(rs.randn(B, H, W, 3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
             gt_valid=jnp.asarray(valid), gt_masks=jnp.asarray(masks),
             img_hw=jnp.asarray([[float(H), float(W)]] * B))
base = dict(
    backbone=dict(type='ResNet', depth=18, frozen_stages=1),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=32,
              num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=32, feat_channels=32),
    test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=50),
                  rcnn=dict(score_thr=0.05,
                            nms=dict(iou_threshold=0.5), max_per_img=10)))


def test_grid_roi_head():
    cfg = dict(type='GridRCNN', roi_head=dict(
        type='GridRoIHead',
        bbox_head=dict(num_classes=6, in_channels=32, fc_out_channels=64),
        grid_head=dict(conv_out_channels=16, num_convs=2),
        bbox_roi_extractor=dict(featmap_strides=[4, 8, 16, 32]),
        train_cfg=dict(sampler=dict(num=32))), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    assert 'grid' in v['params']['roi_head']
    losses = det.forward_train(v, batch, jax.random.PRNGKey(1))
    assert 'loss_grid' in losses
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_grid']) > 0


def test_pointrend_roi_head():
    cfg = dict(type='PointRend', roi_head=dict(
        type='PointRendRoIHead',
        bbox_head=dict(num_classes=6, in_channels=32, fc_out_channels=64),
        mask_head=dict(num_convs=1, conv_out_channels=32, roi_size=7),
        point_head=dict(num_points=32, fc_channels=32),
        bbox_roi_extractor=dict(featmap_strides=[4, 8, 16, 32]),
        train_cfg=dict(sampler=dict(num=32))), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    assert 'point' in v['params']['roi_head']
    losses = det.forward_train(v, batch, jax.random.PRNGKey(1))
    assert 'loss_point' in losses and 'loss_mask' in losses
    assert all(np.isfinite(float(x)) for x in losses.values())
