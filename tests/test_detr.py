"""On-device LAP solvers + DETR end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector
from ld_tpu.ops.matching import auction_lap, hungarian_lap


def test_hungarian_lap_matches_scipy():
    rs = np.random.RandomState(1)
    for _ in range(15):
        r, c = rs.randint(1, 30), rs.choice([40, 100])
        cost = (rs.randn(r, c) * rs.uniform(0.5, 5)).astype(np.float32)
        col = np.asarray(hungarian_lap(jnp.asarray(cost)))
        assert len(set(col.tolist())) == r
        rr, cc = linear_sum_assignment(cost)
        got = cost[np.arange(r), col].sum()
        opt = cost[rr, cc].sum()
        assert abs(got - opt) < 1e-3, (got, opt)


def test_hungarian_lap_masked_and_jit():
    rs = np.random.RandomState(2)
    cost = jnp.asarray(rs.randn(8, 30).astype(np.float32))
    rv = jnp.asarray([True] * 5 + [False] * 3)
    col = np.asarray(jax.jit(hungarian_lap)(cost, rv))
    assert (col[5:] == -1).all()
    assert len(set(col[:5].tolist())) == 5
    rr, cc = linear_sum_assignment(np.asarray(cost)[:5])
    gap = np.asarray(cost)[np.arange(5), col[:5]].sum() - \
        np.asarray(cost)[:5][rr, cc].sum()
    assert abs(gap) < 1e-3


def test_auction_lap_near_optimal():
    rs = np.random.RandomState(3)
    cost = (rs.randn(10, 100) * 2).astype(np.float32)
    col = np.asarray(auction_lap(jnp.asarray(cost)))
    assert len(set(col.tolist())) == 10
    rr, cc = linear_sum_assignment(cost)
    gap = cost[np.arange(10), col].sum() - cost[rr, cc].sum()
    assert gap < 0.5  # eps-optimal


def test_detr_train_and_infer():
    rs = np.random.RandomState(0)
    B, G = 2, 4
    gt = np.zeros((B, G, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    gt[:, 1] = [20, 16, 60, 60]
    valid = np.zeros((B, G), bool)
    valid[:, :2] = True
    batch = dict(
        image=jnp.asarray(rs.randn(B, 64, 96, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
        gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64., 96.]] * B))
    cfg = dict(
        type='DETR',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      out_indices=(3, )),
        bbox_head=dict(type='DETRHead', num_classes=6, in_channels=512,
                       num_query=20, embed_dims=32,
                       transformer=dict(num_encoder_layers=2,
                                        num_decoder_layers=2)),
        test_cfg=dict(max_per_img=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    # final layer + 1 aux layer, 3 terms each
    assert {'loss_cls', 'loss_bbox', 'loss_iou', 'd0.loss_cls',
            'd0.loss_bbox', 'd0.loss_iou'} == set(losses)
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_bbox']) > 0
    d, labels, n = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)
    assert labels.shape == (2, 10)
    # jit-ability of the whole DETR train loss (matching included)
    f = jax.jit(lambda vv: sum(det.forward_train(vv, batch).values()))
    assert np.isfinite(float(f(v)))
