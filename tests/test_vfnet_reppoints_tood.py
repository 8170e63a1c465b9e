"""VFNet / RepPoints / TOOD heads: integration + semantic unit checks."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector
from ld_tpu.models.heads.reppoints_head import points2bbox_shifts
from ld_tpu.ops.deform_conv import DeformConv
from ld_tpu.ops.extra_assigners import GridAssigner, TaskAlignedAssigner

rs = np.random.RandomState(0)
B, G = 2, 4
gt = np.zeros((B, G, 4), np.float32)
gt[:, 0] = [8, 8, 40, 48]
gt[:, 1] = [20, 16, 80, 60]
valid = np.zeros((B, G), bool)
valid[:, :2] = True
batch = dict(image=jnp.asarray(rs.randn(B, 64, 96, 3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
             gt_valid=jnp.asarray(valid),
             img_hw=jnp.asarray([[64., 96.]] * B))
base = dict(
    backbone=dict(type='ResNet', depth=18, frozen_stages=1),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=1, add_extra_convs='on_output', num_outs=5),
    test_cfg=dict(nms_pre=100, score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.6), max_per_img=10))


def test_deform_conv_zero_offset_matches_conv():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    dc = DeformConv(6)
    v = dc.init(jax.random.PRNGKey(0), x, jnp.zeros((1, 8, 8, 18)))
    y = dc.apply(v, x, jnp.zeros((1, 8, 8, 18)))
    # same kernel as plain conv (HWIO reshaping of the matmul weight)
    import jax.lax as lax
    w = v['params']['kernel'].reshape(3, 3, 4, 6)
    ref = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                   dimension_numbers=('NHWC', 'HWIO',
                                                      'NHWC'))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_points2bbox_methods():
    pts = jnp.asarray([[-1., -2., 3., 4., 0., 0., 1., -1.]])  # y-first pairs
    mm = points2bbox_shifts(pts, 'minmax')
    # xs = [-2, 4, 0, -1], ys = [-1, 3, 0, 1]
    np.testing.assert_allclose(np.asarray(mm)[0], [-2, -1, 4, 3], atol=1e-6)
    mom = points2bbox_shifts(pts, 'moment', jnp.zeros(2))
    m = np.asarray(mom)[0]
    assert m[0] < m[2] and m[1] < m[3]
    # centered at the mean
    np.testing.assert_allclose((m[0] + m[2]) / 2, 0.25, atol=1e-5)


def test_task_aligned_assigner():
    a = TaskAlignedAssigner(topk=4, alpha=1.0, beta=2.0)
    anchors = jnp.asarray([[0., 0., 16., 16.], [8., 8., 24., 24.],
                           [100., 100., 116., 116.]])
    pred_boxes = jnp.asarray([[2., 2., 14., 14.], [9., 9., 23., 23.],
                              [100., 100., 116., 116.]])
    scores = jnp.full((3, 5), 0.5)
    gtb = jnp.asarray([[0., 0., 20., 20.]])
    res, align = a.assign(scores, pred_boxes, anchors, gtb,
                          jnp.asarray([2]), jnp.asarray([True]),
                          num_classes=5)
    assert bool(res.pos_mask[0]) and bool(res.pos_mask[1])
    assert not bool(res.pos_mask[2])
    assert int(res.labels[0]) == 2
    # alignment metric larger for the better-matching box
    assert float(align[0, 0]) > float(align[1, 0])


def test_grid_assigner():
    a = GridAssigner(pos_iou_thr=0.5, neg_iou_thr=0.3)
    boxes = jnp.asarray([[0., 0., 10., 10.], [0., 0., 10., 10.]])
    flags = jnp.asarray([[True], [False]])
    gtb = jnp.asarray([[1., 1., 9., 9.]])
    res = a.assign(boxes, flags, gtb, jnp.asarray([1]), jnp.asarray([True]))
    assert bool(res.pos_mask[0]) and not bool(res.pos_mask[1])


def test_vfnet_train_and_infer():
    cfg = dict(type='VFNet', bbox_head=dict(
        type='VFNetHead', num_classes=6, in_channels=32, stacked_convs=1,
        feat_channels=32),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9)), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_bbox_rf'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)


def test_reppoints_train_and_infer():
    cfg = dict(type='RepPointsDetector', bbox_head=dict(
        type='RepPointsHead', num_classes=6, in_channels=32,
        feat_channels=32, point_feat_channels=32, stacked_convs=1,
        transform_method='moment'), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_pts_init', 'loss_pts_refine'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_pts_init']) > 0
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)


def test_tood_train_and_infer():
    cfg = dict(type='TOOD', bbox_head=dict(
        type='TOODHead', num_classes=6, in_channels=32, stacked_convs=2,
        feat_channels=32), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)
