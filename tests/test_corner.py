"""CornerNet: corner pooling, gaussian radius, full head train/infer."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector
from ld_tpu.models.heads.corner_head import corner_pool, gaussian_radius


def test_corner_pool_directions():
    x = jnp.zeros((1, 4, 4, 1)).at[0, 2, 1, 0].set(5.0)
    # 'top' pooling propagates the max upward (each cell sees rows below)
    top = np.asarray(corner_pool(x, 'top'))[0, :, :, 0]
    assert top[0, 1] == 5.0 and top[2, 1] == 5.0 and top[3, 1] == 0.0
    left = np.asarray(corner_pool(x, 'left'))[0, :, :, 0]
    assert left[2, 0] == 5.0 and left[2, 1] == 5.0 and left[2, 2] == 0.0
    bottom = np.asarray(corner_pool(x, 'bottom'))[0, :, :, 0]
    assert bottom[3, 1] == 5.0 and bottom[1, 1] == 0.0
    right = np.asarray(corner_pool(x, 'right'))[0, :, :, 0]
    assert right[2, 3] == 5.0 and right[2, 0] == 0.0


def test_gaussian_radius_monotone():
    r_small = float(gaussian_radius(jnp.asarray(4.0), jnp.asarray(4.0)))
    r_big = float(gaussian_radius(jnp.asarray(40.0), jnp.asarray(40.0)))
    assert 0 <= r_small < r_big


def test_cornernet_train_and_infer():
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
        type='CornerNet',
        backbone=dict(type='HourglassNet', downsample_times=3, num_stacks=2,
                      stage_channels=(16, 16, 24, 32),
                      stage_blocks=(1, 1, 1, 1), feat_channel=16),
        bbox_head=dict(type='CornerHead', num_classes=6, in_channels=16,
                       num_feat_levels=2),
        test_cfg=dict(corner_topk=20, distance_threshold=0.5,
                      score_thr=0.01, nms=dict(iou_threshold=0.5),
                      max_per_img=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    losses = det.forward_train(v, batch)
    for k in ('det_loss.s0', 'pull_loss.s0', 'push_loss.s0', 'off_loss.s0',
              'det_loss.s1'):
        assert k in losses
        assert np.isfinite(float(losses[k])), k
    assert float(losses['det_loss.s0']) > 0
    d, lab, n = det.forward_test(v, batch)
    assert d.shape == (1, 10, 5)
    assert np.isfinite(np.asarray(d)).all()
