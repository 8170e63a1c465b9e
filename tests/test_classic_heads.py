"""Plain FCOS/ATSS head integration tests."""
import jax
import numpy as np
import jax.numpy as jnp

import ld_tpu
from ld_tpu.models import build_detector

rs = np.random.RandomState(0)
B,G = 2,4
gt = np.zeros((B,G,4),np.float32); gt[:,0]=[8,8,40,48]; gt[:,1]=[20,16,80,60]
valid = np.zeros((B,G),bool); valid[:,:2]=True
batch = dict(image=jnp.asarray(rs.randn(B,64,96,3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B,G),np.int32),
             gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64.,96.]]*B))
base = dict(backbone=dict(type='ResNet', depth=18, frozen_stages=1, norm_eval=True),
    neck=dict(type='FPN', in_channels=[64,128,256,512], out_channels=32,
              start_level=1, add_extra_convs='on_output', num_outs=5),
    test_cfg=dict(nms_pre=100, score_thr=0.05, nms=dict(type='nms', iou_threshold=0.6), max_per_img=10))
fl = dict(type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25, loss_weight=1.0)



def test_plain_fcos_head():
    cfg = dict(type='FCOS', bbox_head=dict(
        type='FCOSHead', num_classes=6, in_channels=32, stacked_convs=1,
        feat_channels=32, strides=[8, 16, 32, 64, 128], loss_cls=fl,
        loss_bbox=dict(type='IoULoss', loss_weight=1.0),
        center_sampling=False), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_centerness'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)


def test_plain_atss_head():
    cfg = dict(type='ATSS', bbox_head=dict(
        type='ATSSHead', num_classes=6, in_channels=32, stacked_convs=1,
        feat_channels=32, loss_cls=fl,
        anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder', target_means=[0.] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
        loss_centerness=dict(type='CrossEntropyLoss', use_sigmoid=True,
                             loss_weight=1.0)),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9)), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert all(np.isfinite(float(x)) for x in losses.values())
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)


def test_fovea_head():
    cfg = dict(type='FoveaBox', bbox_head=dict(
        type='FoveaHead', num_classes=6, in_channels=32, stacked_convs=1,
        feat_channels=32, strides=[8, 16, 32, 64, 128],
        base_edge_list=[16, 32, 64, 128, 256],
        scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512),
                      (256, 2048)), sigma=0.4), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_bbox']) > 0  # some cells in the shrunk boxes
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)
