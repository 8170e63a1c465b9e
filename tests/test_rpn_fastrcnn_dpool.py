"""Standalone RPN detector, Fast R-CNN on precomputed proposals, and
deformable RoI pooling (dpool/mdpool).

Parity targets:
  * RPN — /root/reference/mmdet/models/detectors/rpn.py (configs/rpn/)
  * FastRCNN — /root/reference/mmdet/models/detectors/fast_rcnn.py
    (configs/fast_rcnn/, proposals precomputed by an RPN run)
  * DeformRoIPoolPack / ModulatedDeformRoIPoolPack — mmcv deform pooling
    used by configs/dcn/*dpool*/*mdpool* variants.
"""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector

rs = np.random.RandomState(0)
B, G = 1, 4
H, W = 64, 64
gt = np.zeros((B, G, 4), np.float32)
gt[:, 0] = [8, 8, 40, 48]
gt[:, 1] = [20, 16, 56, 60]
valid = np.zeros((B, G), bool)
valid[:, :2] = True
batch = dict(image=jnp.asarray(rs.randn(B, H, W, 3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt),
             gt_labels=jnp.zeros((B, G), np.int32),
             gt_valid=jnp.asarray(valid),
             img_hw=jnp.asarray([[float(H), float(W)]] * B))
base = dict(
    backbone=dict(type='ResNet', depth=18, frozen_stages=1),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=32,
              num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=32, feat_channels=32),
    test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=50),
                  rcnn=dict(score_thr=0.05,
                            nms=dict(iou_threshold=0.5), max_per_img=10)))


def test_rpn_detector():
    cfg = dict(type='RPN',
               backbone=base['backbone'], neck=base['neck'],
               rpn_head=base['rpn_head'],
               test_cfg=dict(nms_pre=100, max_per_img=50))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    assert 'roi_head' not in v['params']
    losses = det.forward_train(v, batch, jax.random.PRNGKey(1))
    assert any('rpn' in k for k in losses)
    assert all(np.isfinite(float(x)) for x in losses.values())
    dets, labels, det_valid = det.forward_test(v, batch)
    assert dets.shape == (B, 50, 5)
    assert labels.shape == (B, 50) and int(labels.max()) == 0


def test_fast_rcnn_precomputed_proposals():
    cfg = dict(type='FastRCNN', roi_head=dict(
        type='StandardRoIHead',
        bbox_head=dict(num_classes=6, in_channels=32, fc_out_channels=64),
        bbox_roi_extractor=dict(featmap_strides=[4, 8, 16, 32])), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    props = np.tile(gt[:, :2], (1, 8, 1)).astype(np.float32)
    props += rs.uniform(-2, 2, props.shape).astype(np.float32)
    props = np.clip(props, 0, 63)
    fb = dict(batch, proposals=jnp.asarray(props),
              proposals_valid=jnp.ones(props.shape[:2], bool))
    losses = det.forward_train(v, fb, jax.random.PRNGKey(1))
    assert {'loss_cls', 'loss_bbox'} <= set(losses)
    # no RPN loss when training on precomputed proposals
    assert not any('rpn' in k for k in losses)
    assert all(np.isfinite(float(x)) for x in losses.values())
    out = det.forward_test(v, fb)
    assert out[0].shape == (B, 10, 5)
    # without proposals it falls back to its own RPN (shared build path)
    losses2 = det.forward_train(v, batch, jax.random.PRNGKey(1))
    assert any('rpn' in k for k in losses2)


def _dpool_cfg(rl_type):
    return dict(type='FasterRCNN', roi_head=dict(
        type='StandardRoIHead',
        bbox_head=dict(num_classes=6, in_channels=32, fc_out_channels=64),
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type=rl_type, output_size=7,
                           deform_fc_channels=64),
            featmap_strides=[4, 8, 16, 32])), **base)


def test_deform_roi_pool_zero_init_matches_plain():
    """Zero-init offsets -> dpool == plain RoIAlign at init (mmcv parity:
    DeformRoIPoolPack starts as the identity deformation)."""
    det_d = build_detector(_dpool_cfg('DeformRoIPoolPack'))
    det_p = build_detector(dict(type='FasterRCNN', roi_head=dict(
        type='StandardRoIHead',
        bbox_head=dict(num_classes=6, in_channels=32, fc_out_channels=64),
        bbox_roi_extractor=dict(featmap_strides=[4, 8, 16, 32])), **base))
    v = det_d.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    assert 'dpool' in v['params']['roi_head']
    vp = jax.tree_util.tree_map(lambda x: x, v)
    vp['params'] = dict(vp['params'])
    vp['params']['roi_head'] = {
        k: x for k, x in v['params']['roi_head'].items() if k != 'dpool'}
    out_d = det_d.forward_test(v, batch)
    out_p = det_p.forward_test(vp, batch)
    np.testing.assert_allclose(np.asarray(out_d[0]), np.asarray(out_p[0]),
                               atol=1e-5)


def test_modulated_deform_roi_pool_trains():
    det = build_detector(_dpool_cfg('ModulatedDeformRoIPoolPack'))
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))

    def loss_fn(params):
        vv = dict(v)
        vv['params'] = params
        losses = det.forward_train(vv, batch, jax.random.PRNGKey(1))
        return sum(jnp.sum(x) for x in losses.values())

    loss, grads = jax.value_and_grad(loss_fn)(v['params'])
    assert np.isfinite(float(loss))
    # offset_fc2 is zero-init, so fc1 gets no gradient at init; fc2 itself
    # receives gradient through the bilinear-sample positions
    goff = grads['roi_head']['dpool']['offset_fc2']['kernel']
    gmask = grads['roi_head']['dpool']['mask_fc2']['kernel']
    assert np.isfinite(np.asarray(goff)).all()
    assert float(jnp.abs(goff).max()) > 0
    assert float(jnp.abs(gmask).max()) > 0
