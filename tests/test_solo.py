"""SOLO: dice/matrix-NMS units + full head train/infer."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector
from ld_tpu.models.heads.solo_head import DiceLoss, matrix_nms


def test_dice_loss_perfect_and_disjoint():
    loss = DiceLoss(use_sigmoid=False, loss_weight=1.0)
    t = jnp.zeros((1, 8, 8)).at[0, 2:6, 2:6].set(1.0)
    assert float(loss(t, t)) < 0.01
    assert float(loss(1.0 - t, t)) > 0.95


def test_matrix_nms_decays_duplicates():
    m = jnp.zeros((3, 8, 8))
    m = m.at[0, 0:4, 0:4].set(1.0)
    m = m.at[1, 0:4, 0:4].set(1.0)       # duplicate of 0
    m = m.at[2, 4:8, 4:8].set(1.0)       # disjoint
    labels = jnp.asarray([1, 1, 1])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    out = np.asarray(matrix_nms(m, labels, scores))
    assert abs(out[0] - 0.9) < 1e-5      # top stays
    assert out[1] < 0.3                  # duplicate decayed hard
    assert out[2] > 0.6                  # disjoint barely touched


def test_solo_train_and_masks():
    rs = np.random.RandomState(0)
    B, G = 1, 3
    H, W = 64, 64
    gt = np.zeros((B, G, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    gt[:, 1] = [30, 20, 60, 60]
    valid = np.zeros((B, G), bool)
    valid[:, :2] = True
    masks = np.zeros((B, G, H // 4, W // 4), np.float32)
    for g in range(2):
        x1, y1, x2, y2 = (gt[0, g] / 4).astype(int)
        masks[0, g, y1:y2, x1:x2] = 1.0
    batch = dict(
        image=jnp.asarray(rs.randn(B, H, W, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
        gt_valid=jnp.asarray(valid), gt_masks=jnp.asarray(masks),
        img_hw=jnp.asarray([[float(H), float(W)]] * B))
    cfg = dict(
        type='SOLO',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=16, start_level=0, num_outs=5),
        bbox_head=dict(type='SOLOHead', num_classes=6, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       num_grids=(12, 10, 8, 6, 4)),
        test_cfg=dict(score_thr=0.05, mask_thr=0.5, max_per_img=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_mask'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_mask']) > 0
    d, labels, n = det.forward_test(v, batch)
    assert d.shape == (1, 10, 5)
    assert np.isfinite(np.asarray(d)).all()
