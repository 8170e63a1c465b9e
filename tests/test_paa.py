"""PAA head: GMM EM fitter unit test + full head integration."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector
from ld_tpu.models.heads.paa_head import fit_gmm_1d


def test_fit_gmm_separates_bimodal():
    rs = np.random.RandomState(0)
    lo = rs.normal(0.5, 0.05, 20)
    hi = rs.normal(3.0, 0.2, 20)
    x = jnp.asarray(np.concatenate([lo, hi]).astype(np.float32))
    valid = jnp.ones(40, bool)
    resp0, logd = fit_gmm_1d(x, valid, iters=20)
    r = np.asarray(resp0)
    assert (r[:20] > 0.9).all()      # low-loss cluster -> component 0
    assert (r[20:] < 0.1).all()
    assert np.isfinite(np.asarray(logd)).all()


def test_fit_gmm_masked():
    x = jnp.asarray([0.1, 0.2, 5.0, 999.0, 999.0])
    valid = jnp.asarray([True, True, True, False, False])
    resp0, logd = fit_gmm_1d(x, valid)
    r = np.asarray(resp0)
    assert r[3] == 0 and r[4] == 0
    assert r[0] > 0.5 and r[1] > 0.5


def test_paa_head_train_and_infer():
    rs = np.random.RandomState(0)
    B, G = 2, 4
    gt = np.zeros((B, G, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    gt[:, 1] = [20, 16, 80, 60]
    valid = np.zeros((B, G), bool)
    valid[:, :2] = True
    batch = dict(
        image=jnp.asarray(rs.randn(B, 64, 96, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
        gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64., 96.]] * B))
    cfg = dict(
        type='PAA',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(
            type='PAAHead', num_classes=6, in_channels=32, stacked_convs=1,
            feat_channels=32, topk=4,
            anchor_generator=dict(ratios=[1.0], octave_base_scale=8,
                                  scales_per_octave=1,
                                  strides=[8, 16, 32, 64, 128])),
        train_cfg=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.1,
                                     neg_iou_thr=0.1, min_pos_iou=0.0)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_iou'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_bbox']) > 0
    # empty gts degrade gracefully
    l0 = det.forward_train(v, dict(batch, gt_valid=jnp.zeros((B, G), bool)))
    assert np.isfinite(float(l0['loss_cls']))
    assert float(l0['loss_bbox']) == 0.0
    d, lab, n = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)
    assert np.isfinite(np.asarray(d)).all()
