"""YOLACT: OHEM cls + coeff/protonet mask path + semantic head."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector

rs = np.random.RandomState(0)
B, G = 2, 4
H, W = 64, 96
gt = np.zeros((B, G, 4), np.float32)
gt[:, 0] = [8, 8, 40, 48]
gt[:, 1] = [20, 16, 80, 60]
valid = np.zeros((B, G), bool)
valid[:, :2] = True
masks = np.zeros((B, G, H // 4, W // 4), np.float32)
for b in range(B):
    for g in range(2):
        x1, y1, x2, y2 = (gt[b, g] / 4).astype(int)
        masks[b, g, y1:y2, x1:x2] = 1.0
batch = dict(image=jnp.asarray(rs.randn(B, H, W, 3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
             gt_valid=jnp.asarray(valid), gt_masks=jnp.asarray(masks),
             img_hw=jnp.asarray([[float(H), float(W)]] * B))


def _build():
    cfg = dict(
        type='YOLACT',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='YOLACTHead', num_classes=6, in_channels=32,
                       feat_channels=32, num_protos=8,
                       max_masks_to_train=8),
        test_cfg=dict(nms_pre=200, score_thr=0.05, iou_thr=0.5,
                      max_per_img=10))
    return build_detector(cfg)


def test_yolact_train_losses():
    det = _build()
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_segm', 'loss_mask'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_mask']) > 0
    assert float(losses['loss_segm']) > 0


def test_yolact_infer_masks():
    det = _build()
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    dets, labels, n, masks_out = det.forward_test(v, batch)
    assert dets.shape == (B, 10, 5)
    assert masks_out.shape == (B, 10, H // 4, W // 4)
    m = np.asarray(masks_out)
    assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()
