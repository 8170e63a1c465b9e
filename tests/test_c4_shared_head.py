"""C4/DC5 family: weight-shared res5 head (ResLayer) + plain BBoxHead.

Parity targets:
  * /root/reference/mmdet/models/roi_heads/shared_heads/res_layer.py —
    shared res5 over pooled 14x14 C4 rois.
  * /root/reference/mmdet/models/roi_heads/bbox_heads/bbox_head.py:12 —
    with_avg_pool BBoxHead (no convs, no FCs).
  * /root/reference/configs/_base_/models/{faster,mask}_rcnn_r50_caffe_c4.py,
    faster_rcnn_r50_caffe_dc5.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector

rs = np.random.RandomState(0)
B, G = 2, 6
gt = np.zeros((B, G, 4), np.float32)
gt[:, 0] = [5, 5, 40, 50]
gt[:, 1] = [20, 15, 80, 60]
valid = np.zeros((B, G), bool)
valid[:, :2] = True
BATCH = dict(image=jnp.asarray(rs.randn(B, 64, 96, 3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt),
             gt_labels=jnp.zeros((B, G), np.int32),
             gt_valid=jnp.asarray(valid),
             img_hw=jnp.asarray([[64., 96.]] * B))


def _c4_cfg(with_mask=False):
    norm_cfg = dict(type='BN', requires_grad=False)
    roi_head = dict(
        type='StandardRoIHead',
        shared_head=dict(type='ResLayer', depth=18, stage=2, stride=2,
                         style='pytorch', norm_cfg=norm_cfg,
                         norm_eval=True),
        bbox_roi_extractor=dict(
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=256, featmap_strides=[16]),
        bbox_head=dict(type='BBoxHead', with_avg_pool=True,
                       roi_feat_size=7, in_channels=256, num_classes=10))
    if with_mask:
        roi_head['mask_roi_extractor'] = None
        roi_head['mask_head'] = dict(type='FCNMaskHead', num_convs=0,
                                     in_channels=256,
                                     conv_out_channels=64, num_classes=10)
    return dict(
        type='MaskRCNN' if with_mask else 'FasterRCNN',
        backbone=dict(type='ResNet', depth=18, num_stages=3,
                      strides=(1, 2, 2), dilations=(1, 1, 1),
                      out_indices=(2, ), frozen_stages=1,
                      norm_cfg=norm_cfg, norm_eval=True, style='pytorch'),
        rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=256,
                      anchor_generator=dict(type='AnchorGenerator',
                                            scales=[2, 4, 8],
                                            ratios=[0.5, 1.0, 2.0],
                                            strides=[16])),
        roi_head=roi_head,
        train_cfg=dict(
            rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                                   neg_iou_thr=0.3, min_pos_iou=0.3),
                     sampler=dict(num=64, pos_fraction=0.5)),
            rpn_proposal=dict(nms_pre=200, max_per_img=64,
                              nms=dict(iou_threshold=0.7)),
            rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                    neg_iou_thr=0.5, min_pos_iou=0.5),
                      sampler=dict(num=32, pos_fraction=0.25),
                      mask_size=14)),
        test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=64,
                               nms=dict(iou_threshold=0.7)),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=20, mask_thr_binary=0.5)))


def test_c4_faster_rcnn_train_and_test():
    det = build_detector(_c4_cfg())
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    # the shared res5 must exist in the roi param tree with its BN stats
    shared = v['params']['roi_head']['shared']
    assert 'params' in shared and 'batch_stats' in shared
    assert any(k.startswith('layer3') for k in shared['params'])
    losses = det.forward_train(v, BATCH, rng=jax.random.PRNGKey(3))
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_cls']) > 1.5  # ~ln(11) at random init
    d, l, va = det.forward_test(v, BATCH)
    assert d.shape == (2, 20, 5)


def test_c4_shared_head_gets_gradients_but_not_its_bn_stats():
    det = build_detector(_c4_cfg())
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))

    def loss_fn(params):
        var = dict(v)
        var = {**v, 'params': params}
        losses = det.forward_train(var, BATCH, rng=jax.random.PRNGKey(3))
        return sum(jnp.sum(x) for x in losses.values())

    grads = jax.grad(loss_fn)(v['params'])
    sh = grads['roi_head']['shared']
    conv_g = jax.tree_util.tree_leaves(
        {k: g for k, g in sh['params'].items()})
    assert any(float(jnp.abs(g).max()) > 0 for g in conv_g)
    stats_g = jax.tree_util.tree_leaves(sh['batch_stats'])
    assert all(float(jnp.abs(g).max()) == 0 for g in stats_g)
    # the optimizer must also be masked off the running stats
    frozen = det.frozen_param_paths()
    assert any('roi_head/shared/batch_stats' in p for p in frozen)
    assert any('bn' in p for p in frozen)  # requires_grad=False affine


def test_c4_mask_rcnn_shares_res5_with_mask_branch():
    det = build_detector(_c4_cfg(with_mask=True))
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, BATCH_WITH_MASKS, rng=jax.random.PRNGKey(3))
    assert 'loss_mask' in losses
    assert all(np.isfinite(float(x)) for x in losses.values())


masks = np.zeros((B, G, 64, 96), np.float32)
masks[:, 0, 5:50, 5:40] = 1.0
masks[:, 1, 15:60, 20:80] = 1.0
BATCH_WITH_MASKS = dict(BATCH, gt_masks=jnp.asarray(masks))


def test_dc5_config_builds_and_runs():
    cfg = _c4_cfg()
    cfg['backbone'] = dict(type='ResNet', depth=18, num_stages=4,
                           strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
                           out_indices=(3, ), frozen_stages=1,
                           norm_eval=True, style='pytorch')
    cfg['rpn_head']['in_channels'] = 512
    cfg['roi_head'] = dict(
        type='StandardRoIHead',
        bbox_roi_extractor=dict(
            roi_layer=dict(type='RoIAlign', output_size=7,
                           sampling_ratio=0),
            out_channels=512, featmap_strides=[16]),
        bbox_head=dict(type='Shared2FCBBoxHead', in_channels=512,
                       fc_out_channels=256, num_classes=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, BATCH, rng=jax.random.PRNGKey(3))
    assert all(np.isfinite(float(x)) for x in losses.values())
    d, _, _ = det.forward_test(v, BATCH)
    assert d.shape == (2, 20, 5)
