"""SABL: bucketing coder round-trip + SABLRetinaHead integration."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.extra_assigners import ApproxMaxIoUAssigner


def test_bucketing_coder_roundtrip():
    c = build_coder(dict(type='BucketingBBoxCoder', num_buckets=14,
                         scale_factor=1.7))
    p = jnp.asarray([[10., 10., 50., 60.], [0., 0., 30., 30.]])
    g = jnp.asarray([[12., 8., 48., 64.], [2., 1., 28., 33.]])
    offs, off_w, lab, cls_w = c.encode(p, g)
    assert offs.shape == (2, 28) and lab.shape == (2, 28)
    # exactly one label bucket per side
    assert np.allclose(np.asarray(lab).reshape(2, 4, 7).sum(-1), 1.0)
    # offset weights cover at most offset_topk buckets per side
    assert (np.asarray(off_w).reshape(2, 4, 7).sum(-1) <= 2 + 1e-6).all()
    # perfect predictions reconstruct the gt box
    cls_logits = lab * 20.0
    best = lab.reshape(2, 4, 7).argmax(-1)
    off_sel = jnp.take_along_axis(offs.reshape(2, 4, 7), best[..., None], -1)
    full_off = (lab.reshape(2, 4, 7) * off_sel).reshape(2, 28)
    boxes, conf = c.decode(p, (cls_logits, full_off))
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(g), atol=1e-4)
    assert np.asarray(conf).min() > 0.9


def test_approx_max_iou_assigner():
    a = ApproxMaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4)
    squares = jnp.asarray([[0., 0., 10., 10.], [20., 20., 40., 40.]])
    # square 0's approx set contains a perfect match for the gt
    approxs = jnp.stack([
        jnp.asarray([[0., 0., 10., 10.], [5., 5., 25., 25.]]),
        jnp.asarray([[20., 20., 40., 40.], [20., 20., 40., 40.]]),
    ])
    gtb = jnp.asarray([[5., 5., 25., 25.]])
    res = a.assign(squares, [2], gtb, jnp.asarray([3]),
                   jnp.asarray([True]), num_classes=6, approxs=approxs)
    assert bool(res.pos_mask[0])          # matched via its approx
    assert int(res.labels[0]) == 3


def test_sabl_retina_head_train_and_infer():
    rs = np.random.RandomState(0)
    B, G = 2, 4
    gt = np.zeros((B, G, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    gt[:, 1] = [20, 16, 80, 60]
    valid = np.zeros((B, G), bool)
    valid[:, :2] = True
    batch = dict(
        image=jnp.asarray(rs.randn(B, 64, 96, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
        gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64., 96.]] * B))
    cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(
            type='SABLRetinaHead', num_classes=6, in_channels=32,
            stacked_convs=1, feat_channels=32,
            approx_anchor_generator=dict(
                octave_base_scale=4, scales_per_octave=3,
                ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128]),
            square_anchor_generator=dict(
                ratios=[1.0], scales=[4], strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='BucketingBBoxCoder', num_buckets=14,
                            scale_factor=3.0)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox_cls', 'loss_bbox_reg'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_bbox_reg']) > 0
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)


def test_sabl_roi_head_faster_rcnn():
    """SABL two-stage (reference bbox_heads/sabl_head.py SABLHead inside
    StandardRoIHead, sabl_faster_rcnn configs): bucket cls + in-bucket
    offset losses finite; decode path produces detections; padded
    zero-size rois must not NaN the offsets (coder clamps bucket widths)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ld_tpu.models import build_detector
    cfg = dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='StandardRoIHead',
                      bbox_roi_extractor=dict(
                          featmap_strides=[4, 8, 16, 32]),
                      bbox_head=dict(type='SABLHead', num_classes=4,
                                     in_channels=64, fc_out_channels=64,
                                     conv_out_channels=32)),
        train_cfg=dict(rcnn=dict(sampler=dict(num=32, pos_fraction=0.25))),
        test_cfg=dict(rpn=dict(nms_pre=64, max_per_img=32),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10)))
    det = build_detector(cfg)
    assert type(det.roi_head).__name__ == 'SABLRoIHead'
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    gt = np.zeros((1, 4, 4), np.float32)
    gt[0, 0] = [5, 5, 40, 50]
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True
    batch = dict(
        image=jnp.asarray(np.random.RandomState(0).randn(1, 64, 96, 3),
                          jnp.float32),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((1, 4), jnp.int32),
        gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64., 96.]]))
    losses = det.forward_train(v, batch)
    assert {'loss_cls', 'loss_bbox_cls', 'loss_bbox_reg'} <= set(losses)
    assert all(np.isfinite(float(x)) for x in losses.values()), losses
    d, l, vv = det.forward_test(v, dict(image=batch['image'],
                                        img_hw=batch['img_hw'],
                                        scale_factor=jnp.ones((1, 4))))
    assert d.shape == (1, 10, 5)


def test_sabl_cascade_rcnn_trains_and_infers():
    """SABL inside CascadeRoIHead (reference sabl_cascade configs):
    per-stage bucketing coders 1.7/1.5/1.3, finite losses every stage,
    bucketing-refined inference."""
    import os
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ld_tpu import Config
    from ld_tpu.models import build_detector
    cfg = Config.fromfile(os.path.join(
        os.path.dirname(__file__), '..',
        'configs/sabl/sabl_cascade_rcnn_r50_fpn_1x_coco.py'))
    mc = dict(cfg.model)
    mc['backbone'] = dict(mc['backbone'], depth=18)
    mc['neck'] = dict(mc['neck'], in_channels=[64, 128, 256, 512])
    mc['train_cfg'] = dict(cfg.get('train_cfg') or {},
                           rcnn=dict(sampler=dict(num=32,
                                                  pos_fraction=0.25)))
    mc['test_cfg'] = dict(rpn=dict(nms_pre=64, max_per_img=32),
                          rcnn=dict(score_thr=0.05,
                                    nms=dict(iou_threshold=0.5),
                                    max_per_img=10))
    det = build_detector(mc)
    assert type(det.roi_head).__name__ == 'CascadeSABLRoIHead'
    assert [c.scale_factor for c in det.roi_head.coders] == [1.7, 1.5, 1.3]
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    gt = np.zeros((1, 4, 4), np.float32)
    gt[0, 0] = [5, 5, 40, 50]
    gt[0, 1] = [20, 15, 80, 60]
    valid = np.zeros((1, 4), bool)
    valid[0, :2] = True
    batch = dict(
        image=jnp.asarray(np.random.RandomState(0).randn(1, 64, 96, 3),
                          jnp.float32),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((1, 4), jnp.int32),
        gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64., 96.]]))
    losses = det.forward_train(v, batch, rng=jax.random.PRNGKey(3))
    for i in range(3):
        assert f'loss_bbox_cls_s{i}' in losses
        assert f'loss_bbox_reg_s{i}' in losses
    assert all(np.isfinite(float(x)) for x in losses.values()), losses
    d, l, vv = det.forward_test(v, dict(image=batch['image'],
                                        img_hw=batch['img_hw'],
                                        scale_factor=jnp.ones((1, 4))))
    assert d.shape == (1, 10, 5)
    assert np.isfinite(np.asarray(d)).all()


def test_sabl_roi_head_with_mask():
    """SABL + mask branch (previously a loud NotImplementedError)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ld_tpu.models import build_detector
    cfg = dict(
        type='MaskRCNN',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='StandardRoIHead',
                      bbox_roi_extractor=dict(
                          featmap_strides=[4, 8, 16, 32]),
                      bbox_head=dict(type='SABLHead', num_classes=4,
                                     in_channels=64, fc_out_channels=64,
                                     conv_out_channels=32),
                      mask_head=dict(num_convs=2, conv_out_channels=32)),
        train_cfg=dict(rcnn=dict(sampler=dict(num=32, pos_fraction=0.25))),
        test_cfg=dict(rpn=dict(nms_pre=64, max_per_img=32),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10)))
    det = build_detector(cfg)
    assert type(det.roi_head).__name__ == 'SABLRoIHead'
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    gt = np.zeros((1, 4, 4), np.float32)
    gt[0, 0] = [5, 5, 40, 50]
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True
    batch = dict(
        image=jnp.asarray(np.random.RandomState(0).randn(1, 64, 96, 3),
                          jnp.float32),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((1, 4), jnp.int32),
        gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64., 96.]]),
        gt_masks=jnp.ones((1, 4, 64, 96), jnp.float32))
    losses = det.forward_train(v, batch)
    assert 'loss_mask' in losses
    assert all(np.isfinite(float(x)) for x in losses.values()), losses
    out = det.forward_test(v, dict(image=batch['image'],
                                   img_hw=batch['img_hw'],
                                   scale_factor=jnp.ones((1, 4))))
    assert len(out) == 4  # dets, labels, valid, masks


def test_sabl_bbox_head_tower_structure():
    """The reference side-aware tower (sabl_head.py:121-131): upsample_x/y
    ConvTranspose params exist, per-position predictors are shared across
    axes, and output stays (R, 4*side_num)."""
    import jax
    import jax.numpy as jnp
    from ld_tpu.models.heads.roi_head import SABLBBoxHeadNet

    net = SABLBBoxHeadNet(num_classes=4, side_num=7, roi_size=7,
                          reg_feat_up_ratio=2)
    feats = jnp.ones((3, 7, 7, 256))
    vars_ = net.init(jax.random.PRNGKey(0), feats)
    names = set(vars_['params'])
    assert {'upsample_x', 'upsample_y', 'reg_conv_att_x', 'reg_conv_att_y',
            'reg_pre_conv0', 'reg_pre_conv1', 'reg_post_conv_x0',
            'reg_post_conv_y0', 'fc_reg_offset', 'fc_reg_cls'} <= names
    # shared per-position predictor: one fc_reg_offset, C->1
    assert vars_['params']['fc_reg_offset']['kernel'].shape == (256, 1)
    cls, (bc, bo) = net.apply(vars_, feats)
    assert cls.shape == (3, 5) and bc.shape == (3, 28) and bo.shape == (3, 28)
