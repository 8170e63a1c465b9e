"""RepPoints use_grid_points (bbox representation) tests.

Parity: /root/reference/mmdet/models/dense_heads/reppoints_head.py
gen_grid_from_reg + configs/reppoints/bbox_r50_grid_fpn_gn-neck+head
(transform_method='minmax', use_grid_points=True, MaxIoU init assigner).
"""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector
from ld_tpu.models.heads.reppoints_head import gen_grid_from_reg


def test_gen_grid_matches_reference_formula():
    rng = np.random.RandomState(0)
    reg = rng.randn(3, 4).astype(np.float32) * 0.3
    prev = np.array([[-2., -2., 2., 2.]] * 3, np.float32)
    pts, box = gen_grid_from_reg(jnp.asarray(reg), jnp.asarray(prev), 3)
    pts, box = np.asarray(pts), np.asarray(box)
    # reference formula, straight numpy
    bxy = (prev[:, :2] + prev[:, 2:]) / 2
    bwh = np.maximum(prev[:, 2:] - prev[:, :2], 1e-6)
    wh = bwh * np.exp(reg[:, 2:])
    tl = bxy + bwh * reg[:, :2] - 0.5 * wh
    np.testing.assert_allclose(box[:, :2], tl, rtol=1e-5)
    np.testing.assert_allclose(box[:, 2:], tl + wh, rtol=1e-5)
    p = pts.reshape(3, 9, 2)   # (y, x) per point, y slowest
    # grid corners recover the box exactly (minmax transform == box)
    np.testing.assert_allclose(p[:, 0], tl[:, ::-1], rtol=1e-5)
    np.testing.assert_allclose(p[:, -1], (tl + wh)[:, ::-1], rtol=1e-5)
    # x varies fastest within a row, y constant across a row
    np.testing.assert_allclose(p[:, 0, 0], p[:, 1, 0], rtol=1e-6)
    assert np.all(p[:, 1, 1] >= p[:, 0, 1])


def _cfg():
    return dict(
        type='RepPointsDetector',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, start_level=1, add_extra_convs='on_input',
                  num_outs=5, norm_cfg=dict(type='GN', num_groups=32)),
        bbox_head=dict(type='RepPointsHead', num_classes=5, in_channels=64,
                       feat_channels=64, point_feat_channels=64,
                       stacked_convs=2, transform_method='minmax',
                       use_grid_points=True),
        train_cfg=dict(
            init=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                    neg_iou_thr=0.4, min_pos_iou=0,
                                    ignore_iof_thr=-1)),
            refine=dict(assigner=dict(type='MaxIoUAssigner',
                                      pos_iou_thr=0.5, neg_iou_thr=0.4,
                                      min_pos_iou=0))),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.5), max_per_img=10))


def test_grid_reppoints_trains_and_infers():
    det = build_detector(_cfg())
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    rs = np.random.RandomState(0)
    gt = np.zeros((2, 4, 4), np.float32)
    gt[:, 0] = [5, 5, 40, 50]
    gt[:, 1] = [20, 15, 80, 60]
    valid = np.zeros((2, 4), bool)
    valid[:, :2] = True
    batch = dict(image=jnp.asarray(rs.randn(2, 64, 96, 3).astype(np.float32)),
                 gt_bboxes=jnp.asarray(gt),
                 gt_labels=jnp.zeros((2, 4), np.int32),
                 gt_valid=jnp.asarray(valid),
                 img_hw=jnp.asarray([[64., 96.]] * 2))
    losses = det.forward_train(v, batch)
    assert set(losses) >= {'loss_cls', 'loss_pts_init', 'loss_pts_refine'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    # 4-channel regression heads, not 2*num_points
    head = v['params']['head'] if 'head' in v['params'] else \
        v['params'].get('bbox_head', v['params'])
    flat = jax.tree_util.tree_leaves_with_path(v['params'])
    kshapes = {''.join(str(getattr(p, 'key', '')) for p in path): l.shape
               for path, l in flat}
    out_kernels = [s for k, s in kshapes.items()
                   if 'pts_init_out' in k and k.endswith('kernel')]
    assert out_kernels and out_kernels[0][-1] == 4
    d, l, va = det.forward_test(v, batch)
    assert d.shape[-1] == 5
    del head
