"""PISA: ISR-P ranking semantics + CARL + full head."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector
from ld_tpu.models.losses.pisa_loss import carl_weights, isr_p


def test_isr_p_ranks_by_iou():
    # 4 positives of one class / one gt with decreasing IoU: importance
    # weights must decrease with IoU rank, and renorm keeps magnitude
    ious = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    labels = jnp.zeros(4, jnp.int32)
    gts = jnp.zeros(4, jnp.int32)
    v = jnp.ones(4, bool)
    base = jnp.ones(4)
    cls_loss = jnp.ones(4)
    w = np.asarray(isr_p(ious, labels, gts, v, base, cls_loss, k=2.0,
                         bias=0.0))
    assert (np.diff(w) < 0).all()          # monotone decreasing
    np.testing.assert_allclose(w.sum(), 4.0, rtol=1e-5)  # renormalized


def test_isr_p_masks_invalid():
    ious = jnp.asarray([0.9, 0.5, 0.0])
    v = jnp.asarray([True, True, False])
    w = np.asarray(isr_p(ious, jnp.zeros(3, jnp.int32),
                         jnp.zeros(3, jnp.int32), v, jnp.ones(3),
                         jnp.ones(3)))
    assert w[2] == 0.0 and w[0] > w[1]


def test_carl_weights():
    p = jnp.asarray([0.9, 0.1, 0.5])
    v = jnp.ones(3, bool)
    w = np.asarray(carl_weights(p, v, k=1.0, bias=0.2))
    np.testing.assert_allclose(w.sum(), 3.0, rtol=1e-5)
    assert w[0] > w[2] > w[1]              # higher cls prob -> more weight


def test_pisa_retina_head():
    rs = np.random.RandomState(0)
    B, G = 1, 4
    gt = np.zeros((B, G, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    gt[:, 1] = [20, 16, 56, 60]
    valid = np.zeros((B, G), bool)
    valid[:, :2] = True
    batch = dict(
        image=jnp.asarray(rs.randn(B, 64, 64, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
        gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[64., 64.]] * B))
    cfg = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='PISARetinaHead', num_classes=6, in_channels=32,
                       stacked_convs=1, feat_channels=32, max_pos=32,
                       anchor_generator=dict(octave_base_scale=4,
                                             scales_per_octave=1,
                                             ratios=[1.0],
                                             strides=[8, 16, 32, 64, 128])),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.5),
                      max_per_img=10))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 64, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_carl'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_carl']) > 0
