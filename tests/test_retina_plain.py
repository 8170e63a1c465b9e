"""Plain (delta-regression) RetinaNet head test."""
import jax
import numpy as np
import jax.numpy as jnp

import ld_tpu
from ld_tpu.models import build_detector

cfg = dict(type='RetinaNet',
    backbone=dict(type='ResNet', depth=18, frozen_stages=1, norm_eval=True),
    neck=dict(type='FPN', in_channels=[64,128,256,512], out_channels=64,
              start_level=1, add_extra_convs='on_input', num_outs=5),
    bbox_head=dict(type='RetinaHead', num_classes=6, in_channels=64,
        stacked_convs=1, feat_channels=64,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=4,
            scales_per_octave=3, ratios=[0.5,1.0,2.0], strides=[8,16,32,64,128]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder', target_means=[0.]*4, target_stds=[1.]*4),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
    train_cfg=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0)),
    test_cfg=dict(nms_pre=100, score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5), max_per_img=10))

B,G = 2,4
rs = np.random.RandomState(0)
gt = np.zeros((B,G,4),np.float32); gt[:,0]=[8,8,40,48]; gt[:,1]=[20,16,80,60]
valid = np.zeros((B,G),bool); valid[:,:2]=True
batch = dict(image=jnp.asarray(rs.randn(B,64,96,3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B,G),np.int32),
             gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64.,96.]]*B))


def test_plain_retina_head():
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    d, l, va = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)
