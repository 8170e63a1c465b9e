"""PISA two-stage / PISA-SSD / GA-Faster integration tests.

Parity targets:
  * /root/reference/mmdet/models/roi_heads/pisa_roi_head.py (ISR-P on the
    rcnn classification weights + CARL) via configs/pisa/pisa_faster_rcnn.
  * /root/reference/mmdet/models/dense_heads/pisa_ssd_head.py (PISA on the
    real SSD tower) via configs/pisa/pisa_ssd300_coco.py.
  * /root/reference/mmdet/models/dense_heads/ga_rpn_head.py feeding
    proposals into a two-stage detector (configs/guided_anchoring/
    ga_faster_*).
"""
import jax
import jax.numpy as jnp
import numpy as np

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


def _two_stage_base(roi_type='StandardRoIHead', rpn=None, rcnn_extra=None):
    rcnn = dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                              neg_iou_thr=0.5, min_pos_iou=0.5),
                sampler=dict(num=32, pos_fraction=0.25))
    rcnn.update(rcnn_extra or {})
    return dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=rpn or dict(
            type='RPNHead', in_channels=64,
            anchor_generator=dict(type='AnchorGenerator', scales=[8],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64])),
        roi_head=dict(type=roi_type,
                      bbox_roi_extractor=dict(
                          roi_layer=dict(output_size=7),
                          featmap_strides=[4, 8, 16, 32]),
                      bbox_head=dict(num_classes=10, in_channels=64)),
        train_cfg=dict(
            rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                                   neg_iou_thr=0.3, min_pos_iou=0.3),
                     sampler=dict(num=64, pos_fraction=0.5)),
            rpn_proposal=dict(nms_pre=200, max_per_img=64,
                              nms=dict(iou_threshold=0.7)),
            rcnn=rcnn),
        test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=64,
                               nms=dict(iou_threshold=0.7)),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=20)))


def test_pisa_roi_head_trains_with_carl():
    cfg = _two_stage_base(roi_type='PISARoIHead',
                          rcnn_extra=dict(isr=dict(k=2, bias=0),
                                          carl=dict(k=1, bias=0.2)))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, BATCH, rng=jax.random.PRNGKey(3))
    assert 'loss_carl' in losses
    assert all(np.isfinite(float(x)) for x in losses.values())
    g = jax.grad(lambda p: sum(
        jnp.sum(x) for x in det.forward_train(
            {**v, 'params': p}, BATCH,
            rng=jax.random.PRNGKey(3)).values()))(v['params'])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_ga_faster_rcnn_end_to_end():
    rpn = dict(
        type='GARPNHead', in_channels=64, feat_channels=64,
        approx_anchor_generator=dict(type='AnchorGenerator',
                                     octave_base_scale=8,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=[4, 8, 16, 32, 64]),
        square_anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                     scales=[8],
                                     strides=[4, 8, 16, 32, 64]))
    det = build_detector(_two_stage_base(rpn=rpn))
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, BATCH, rng=jax.random.PRNGKey(3))
    # GA-RPN terms must be rpn-prefixed so the roi head's are not clobbered
    assert {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_rpn_shape',
            'loss_rpn_loc', 'loss_cls', 'loss_bbox'} <= set(losses)
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_cls']) > 1.5  # ~ln(11): roi loss intact
    d, l, va = det.forward_test(v, BATCH)
    assert d.shape == (2, 20, 5)


def test_pisa_ssd_head_small():
    cfg = dict(
        type='SSD',
        backbone=dict(type='SSDVGG', input_size=300, l2_norm_scale=20),
        neck=None,
        bbox_head=dict(
            type='PISASSDHead', num_classes=5,
            in_channels=(512, 1024, 512, 256, 256, 256),
            anchor_generator=dict(
                type='SSDAnchorGenerator', input_size=300,
                basesize_ratio_range=(0.15, 0.9),
                strides=[8, 16, 32, 64, 100, 300],
                ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]])),
        train_cfg=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.,
                          gt_max_assign_all=False),
            isr=dict(k=2., bias=0.), carl=dict(k=1., bias=0.2),
            smoothl1_beta=1., neg_pos_ratio=3),
        test_cfg=dict(nms_pre=100, score_thr=0.02,
                      nms=dict(iou_threshold=0.45), max_per_img=20))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 300, 300, 3))
    batch = dict(image=jnp.zeros((1, 300, 300, 3)),
                 gt_bboxes=jnp.asarray([[[5., 5., 80., 90.]]]),
                 gt_labels=jnp.zeros((1, 1), np.int32),
                 gt_valid=jnp.ones((1, 1), bool),
                 img_hw=jnp.asarray([[300., 300.]]))
    losses = det.forward_train(v, batch)
    assert {'loss_cls', 'loss_bbox', 'loss_carl'} <= set(losses)
    assert all(np.isfinite(float(x)) for x in losses.values())
