"""Mask R-CNN branch tests."""
import numpy as np
import jax
import jax.numpy as jnp

import ld_tpu
from ld_tpu.models import build_detector
from ld_tpu.models.heads.mask_head import mask_targets


def _mask_rcnn_cfg():
    return dict(
        type='MaskRCNN',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=256, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=256,
                      anchor_generator=dict(type='AnchorGenerator',
                                            scales=[8],
                                            ratios=[0.5, 1.0, 2.0],
                                            strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(roi_layer=dict(output_size=7),
                                    featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(num_classes=5, in_channels=256),
            mask_roi_extractor=dict(roi_layer=dict(output_size=14),
                                    featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(type='FCNMaskHead', num_convs=2,
                           conv_out_channels=64, num_classes=5,
                           mask_stride=4)),
        train_cfg=dict(
            rpn=dict(sampler=dict(num=32, pos_fraction=0.5)),
            rpn_proposal=dict(nms_pre=100, max_per_img=32,
                              nms=dict(iou_threshold=0.7)),
            rcnn=dict(sampler=dict(num=16, pos_fraction=0.25))),
        test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=32,
                               nms=dict(iou_threshold=0.7)),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10)))


def _batch(b=2, g=4, h=64, w=96):
    rs = np.random.RandomState(0)
    gt = np.zeros((b, g, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    gt[:, 1] = [20, 16, 80, 60]
    valid = np.zeros((b, g), bool)
    valid[:, :2] = True
    masks = np.zeros((b, g, h // 4, w // 4), np.float32)
    for i in range(b):
        for j in range(2):
            x1, y1, x2, y2 = (gt[i, j] / 4).astype(int)
            masks[i, j, y1:y2, x1:x2] = 1.0
    return dict(image=jnp.asarray(rs.randn(b, h, w, 3).astype(np.float32)),
                gt_bboxes=jnp.asarray(gt),
                gt_labels=jnp.zeros((b, g), np.int32),
                gt_valid=jnp.asarray(valid),
                gt_masks=jnp.asarray(masks),
                img_hw=jnp.asarray([[float(h), float(w)]] * b))


def test_mask_rcnn_train_loss():
    det = build_detector(_mask_rcnn_cfg())
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    assert 'mask' in v['params']['roi_head']
    losses = det.forward_train(v, _batch(), rng=jax.random.PRNGKey(1))
    assert 'loss_mask' in losses
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_mask']) > 0


def test_mask_targets_crop():
    # a gt mask filling [8, 8, 40, 48]; roi over the same region must crop
    # to (almost) all ones
    gm = np.zeros((1, 16, 24), np.float32)   # stride-4 mask of 64x96 image
    gm[0, 2:12, 2:10] = 1.0
    rois = jnp.asarray([[8., 8., 40., 48.]])
    t = mask_targets(jnp.asarray(gm), rois, jnp.asarray([0]), 8,
                     mask_stride=4.0)
    assert t.shape == (1, 8, 8)
    assert float(t.mean()) > 0.8
    # roi over an empty region crops to zeros
    t2 = mask_targets(jnp.asarray(gm), jnp.asarray([[60., 40., 90., 60.]]),
                      jnp.asarray([0]), 8, mask_stride=4.0)
    assert float(t2.max()) < 0.2


def test_mask_rcnn_simple_test_returns_masks():
    det = build_detector(_mask_rcnn_cfg())
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    out = det.forward_test(v, _batch())
    assert len(out) == 4
    dets, labels, valid, masks = out
    assert masks.shape == (2, 10, 28, 28)
    assert float(masks.min()) >= 0 and float(masks.max()) <= 1
