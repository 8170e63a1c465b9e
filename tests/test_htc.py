"""Hybrid Task Cascade: 3-stage bbox + per-stage masks with info flow +
semantic branch."""
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
masks = np.zeros((B, G, H // 4, W // 4), np.float32)
for g in range(2):
    x1, y1, x2, y2 = (gt[0, g] / 4).astype(int)
    masks[0, g, y1:y2, x1:x2] = 1.0
batch = dict(image=jnp.asarray(rs.randn(B, H, W, 3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
             gt_valid=jnp.asarray(valid), gt_masks=jnp.asarray(masks),
             img_hw=jnp.asarray([[float(H), float(W)]] * B))


def test_htc_train():
    cfg = dict(
        type='HybridTaskCascade',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=32, feat_channels=32),
        roi_head=dict(
            type='HybridTaskCascadeRoIHead', num_stages=2,
            stage_loss_weights=(1.0, 0.5),
            bbox_head=dict(num_classes=6, in_channels=32,
                           fc_out_channels=64),
            mask_head=dict(num_convs=1, conv_out_channels=32, roi_size=7),
            semantic_head=dict(num_classes=2, conv_out_channels=32),
            bbox_roi_extractor=dict(featmap_strides=[4, 8, 16, 32]),
            train_cfg=[dict(sampler=dict(num=64)),
                       dict(sampler=dict(num=64))]),
        test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=50),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10)))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    p = v['params']['roi_head']
    assert {'stage0', 'stage1', 'mask0', 'mask1', 'semantic'} <= set(p)
    # stage-1 mask net owns the info-flow adapter, stage-0 does not
    assert 'info_flow' in p['mask1'] and 'info_flow' not in p['mask0']
    losses = det.forward_train(v, batch, jax.random.PRNGKey(1))
    expect = {'loss_semantic_seg', 'loss_cls_s0', 'loss_bbox_s0',
              'loss_mask_s0', 'loss_cls_s1', 'loss_bbox_s1', 'loss_mask_s1'}
    assert expect <= set(losses), set(losses)
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_mask_s0']) > 0
    # cascade inference path still works (inherited from CascadeRoIHead)
    out = det.forward_test(v, batch)
    assert out[0].shape == (B, 10, 5)
