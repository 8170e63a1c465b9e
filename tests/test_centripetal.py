"""CentripetalNet head train/infer."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector


def test_centripetal_train_and_infer():
    rs = np.random.RandomState(0)
    B, G = 1, 3
    H, W = 64, 64
    gt = np.zeros((B, G, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    gt[:, 1] = [20, 16, 56, 60]
    valid = np.zeros((B, G), bool)
    valid[:, :2] = True
    batch = dict(
        image=jnp.asarray(rs.randn(B, H, W, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
        gt_valid=jnp.asarray(valid),
        img_hw=jnp.asarray([[float(H), float(W)]] * B))
    cfg = dict(
        type='CentripetalNet',
        backbone=dict(type='HourglassNet', downsample_times=3, num_stacks=2,
                      stage_channels=(16, 16, 24, 32),
                      stage_blocks=(1, 1, 1, 1), feat_channel=16),
        bbox_head=dict(type='CentripetalHead', num_classes=6,
                       in_channels=16, num_feat_levels=2),
        test_cfg=dict(corner_topk=20, score_thr=0.01,
                      nms=dict(iou_threshold=0.5), max_per_img=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    losses = det.forward_train(v, batch)
    for k in ('det_loss.s0', 'guiding_loss.s0', 'centripetal_loss.s0',
              'off_loss.s0', 'det_loss.s1'):
        assert k in losses and np.isfinite(float(losses[k])), k
    assert float(losses['centripetal_loss.s0']) > 0
    d, lab, n = det.forward_test(v, batch)
    assert d.shape == (1, 10, 5)
    assert np.isfinite(np.asarray(d)).all()
