"""FSAF (online feature selection) and FreeAnchor head integration tests."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401  (registers everything)
from ld_tpu.models import build_detector

rs = np.random.RandomState(0)
B, G = 2, 4
gt = np.zeros((B, G, 4), np.float32)
gt[:, 0] = [8, 8, 40, 48]
gt[:, 1] = [20, 16, 80, 60]
valid = np.zeros((B, G), bool)
valid[:, :2] = True
batch = dict(image=jnp.asarray(rs.randn(B, 64, 96, 3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
             gt_valid=jnp.asarray(valid),
             img_hw=jnp.asarray([[64., 96.]] * B))
empty = dict(batch, gt_valid=jnp.zeros((B, G), bool))
base = dict(
    backbone=dict(type='ResNet', depth=18, frozen_stages=1, norm_eval=True),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=1, add_extra_convs='on_output', num_outs=5),
    test_cfg=dict(nms_pre=100, score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.6), max_per_img=10))


def test_fsaf_head_loss_and_infer():
    cfg = dict(type='FSAF', bbox_head=dict(
        type='FSAFHead', num_classes=6, in_channels=32, stacked_convs=1,
        feat_channels=32,
        anchor_generator=dict(octave_base_scale=1, scales_per_octave=1,
                              ratios=[1.0], strides=[8, 16, 32, 64, 128])),
        train_cfg=dict(assigner=dict(type='CenterRegionAssigner',
                                     pos_scale=0.2, neg_scale=0.2)), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['loss_bbox']) > 0
    # empty gt: cls loss remains (all negatives), bbox loss -> 0
    l0 = det.forward_train(v, empty)
    assert float(l0['loss_cls']) > 0
    assert float(l0['loss_bbox']) == 0.0
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)


def test_fsaf_online_selection_is_exclusive():
    """Each gt's positives live on exactly one pyramid level."""
    from ld_tpu.utils.registry import HEADS
    head = HEADS.build(dict(
        type='FSAFHead', num_classes=6, in_channels=32, stacked_convs=1,
        feat_channels=32,
        anchor_generator=dict(octave_base_scale=1, scales_per_octave=1,
                              ratios=[1.0], strides=[8, 16, 32, 64, 128])))
    sizes = [(8, 12), (4, 6), (2, 3), (1, 2), (1, 1)]
    feats = [jnp.zeros((B, h, w, 32)) for h, w in sizes]
    v = head.net.init(jax.random.PRNGKey(0), feats)
    outs = head.net.apply(v, feats)
    losses = head.loss(outs, batch, sizes)
    assert np.isfinite(float(losses['loss_cls']))


def test_free_anchor_loss_and_infer():
    cfg = dict(type='RetinaNet', bbox_head=dict(
        type='FreeAnchorRetinaHead', num_classes=6, in_channels=32,
        stacked_convs=1, feat_channels=32, pre_anchor_topk=8,
        anchor_generator=dict(octave_base_scale=4, scales_per_octave=1,
                              ratios=[0.5, 1.0, 2.0],
                              strides=[8, 16, 32, 64, 128])), **base)
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, batch)
    assert set(losses) == {'positive_bag_loss', 'negative_bag_loss'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses['positive_bag_loss']) > 0
    # no gts: positive bag loss vanishes, negative stays finite
    l0 = det.forward_train(v, empty)
    assert float(l0['positive_bag_loss']) == 0.0
    assert np.isfinite(float(l0['negative_bag_loss']))
    d, _, _ = det.forward_test(v, batch)
    assert d.shape == (2, 10, 5)
