"""Sparse R-CNN: learnable proposals, DII stages, set-based loss."""
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
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
             gt_valid=jnp.asarray(valid),
             img_hw=jnp.asarray([[float(H), float(W)]] * B))


def test_sparse_rcnn_train_and_infer():
    cfg = dict(
        type='SparseRCNN',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=4),
        rpn_head=dict(type='EmbeddingRPNHead', num_proposals=16),
        roi_head=dict(type='SparseRoIHead', num_stages=2,
                      bbox_head=[dict(num_classes=6)] * 2),
        test_cfg=dict(max_per_img=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    assert 'init_proposal_boxes' in v['params']
    assert 'dii0' in v['params'] and 'dii1' in v['params']
    losses = det.forward_train(v, batch)
    assert {'loss_cls', 'loss_bbox', 'loss_iou', 'loss_cls_s0'} <= \
        set(losses)
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_bbox']) > 0
    d, lab, n = det.forward_test(v, batch)
    assert d.shape == (B, 10, 5)
    assert np.isfinite(np.asarray(d)).all()
