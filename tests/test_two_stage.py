"""Two-stage (Faster R-CNN) + KD two-stage integration tests."""
import jax
import numpy as np, jax.numpy as jnp
import ld_tpu
from ld_tpu.models import build_detector

rs = np.random.RandomState(0)
B,G = 2,6
gt = np.zeros((B,G,4),np.float32); gt[:,0]=[5,5,40,50]; gt[:,1]=[20,15,80,60]
valid = np.zeros((B,G),bool); valid[:,:2]=True
batch = dict(image=jnp.asarray(rs.randn(B,64,96,3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B,G),np.int32),
             gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64.,96.]]*B))

cfg = dict(
    type='FasterRCNN',
    backbone=dict(type='ResNet', depth=18, frozen_stages=1, norm_eval=True),
    neck=dict(type='FPN', in_channels=[64,128,256,512], out_channels=256, num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=256,
        anchor_generator=dict(type='AnchorGenerator', scales=[8], ratios=[0.5,1.0,2.0],
                              strides=[4,8,16,32,64])),
    roi_head=dict(type='StandardRoIHead',
        bbox_roi_extractor=dict(roi_layer=dict(output_size=7), featmap_strides=[4,8,16,32]),
        bbox_head=dict(num_classes=10, in_channels=256)),
    train_cfg=dict(
        rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3),
                 sampler=dict(num=64, pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=200, max_per_img=64, nms=dict(iou_threshold=0.7)),
        rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5),
                  sampler=dict(num=32, pos_fraction=0.25))),
    test_cfg=dict(rpn=dict(nms_pre=200, max_per_img=64, nms=dict(iou_threshold=0.7)),
                  rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5), max_per_img=20)))


def test_two_stage_train_and_test():
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch, rng=jax.random.PRNGKey(3))
    assert set(losses) == {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls',
                           'loss_bbox'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_cls']) > 1.5  # ~ln(11) at random init
    d, l, va = det.forward_test(v, batch)
    assert d.shape == (2, 20, 5)


def test_kd_two_stage():
    kd_cfg = dict(cfg, type='KnowledgeDistillationTwoStageDetector',
                  teacher_config=dict(model=dict(cfg)), teacher_ckpt=None)
    det2 = build_detector(kd_cfg)
    sv = det2.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    tv = det2.init_teacher_variables(jax.random.PRNGKey(1), (1, 64, 96, 3))
    losses = det2.forward_train(sv, batch, teacher_variables=tv,
                                rng=jax.random.PRNGKey(3))
    assert 'loss_rpn_kd' in losses and 'loss_rpn_ld' in losses
    assert all(np.isfinite(float(x)) for x in losses.values())
    # self-distillation: KD terms vanish
    l2 = det2.forward_train(sv, batch, teacher_variables=sv,
                            rng=jax.random.PRNGKey(3))
    assert abs(float(l2['loss_rpn_kd'])) < 1e-6
    assert abs(float(l2['loss_rpn_ld'])) < 1e-6
