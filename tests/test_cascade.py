"""Cascade R-CNN integration test."""
import jax
import numpy as np
import jax.numpy as jnp

import ld_tpu
from ld_tpu.models import build_detector

cfg = dict(
    type='CascadeRCNN',
    backbone=dict(type='ResNet', depth=18, frozen_stages=1, norm_eval=True),
    neck=dict(type='FPN', in_channels=[64,128,256,512], out_channels=256, num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=256,
        anchor_generator=dict(type='AnchorGenerator', scales=[8], ratios=[0.5,1.0,2.0],
                              strides=[4,8,16,32,64])),
    roi_head=dict(type='CascadeRoIHead', num_stages=3,
        bbox_roi_extractor=dict(roi_layer=dict(output_size=7), featmap_strides=[4,8,16,32]),
        bbox_head=dict(num_classes=6, in_channels=256)),
    train_cfg=dict(
        rpn=dict(sampler=dict(num=32, pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=100, max_per_img=32, nms=dict(iou_threshold=0.7)),
        rcnn=dict(sampler=dict(num=16, pos_fraction=0.25))),
    test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=32, nms=dict(iou_threshold=0.7)),
                  rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5), max_per_img=10)))

B,G = 2,4
rs = np.random.RandomState(0)
gt = np.zeros((B,G,4),np.float32); gt[:,0]=[8,8,40,48]; gt[:,1]=[20,16,80,60]
valid = np.zeros((B,G),bool); valid[:,:2]=True
batch = dict(image=jnp.asarray(rs.randn(B,64,96,3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B,G),np.int32),
             gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64.,96.]]*B))


def test_cascade_rcnn():
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    assert 'stage2' in v['params']['roi_head']
    losses = det.forward_train(v, batch, rng=jax.random.PRNGKey(1))
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert {'loss_cls_s0', 'loss_cls_s1', 'loss_cls_s2'} <= set(losses)
    # stage weights decay 1 / 0.5 / 0.25
    d, l, va = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)
