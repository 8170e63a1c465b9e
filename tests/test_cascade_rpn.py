"""Cascade RPN: adaptive-conv two-stage refinement + RegionAssigner."""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu.models.heads.cascade_rpn_head import (
    CascadeRPNHead, anchor_offsets, cascade_rpn_loss,
    cascade_rpn_proposals)
from ld_tpu.ops.extra_assigners import RegionAssigner


def test_anchor_offsets_zero_for_grid_anchors():
    # anchors that exactly tile the 3x3 grid (stride-sized squares centered
    # on cells, extent = 2*stride so extent/2 - 1 == stride/stride - ... )
    stride = 8.0
    h = w = 4
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    cx = (xs * stride).astype(np.float32)
    cy = (ys * stride).astype(np.float32)
    half = stride  # extent 2*stride -> taps land exactly on the 3x3 grid
    am = np.stack([cx - half, cy - half, cx + half, cy + half], -1)[None]
    off = np.asarray(anchor_offsets(jnp.asarray(am), stride))
    np.testing.assert_allclose(off, 0.0, atol=1e-5)


def test_region_assigner_levels():
    a = RegionAssigner(center_ratio=0.5)
    # two levels of 4x4 and 2x2 cells at strides 8, 16
    anchors = []
    for s, n in ((8, 4), (16, 2)):
        ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing='ij')
        cx = (xs + 0.5) * s
        cy = (ys + 0.5) * s
        anchors.append(np.stack([cx - s / 2, cy - s / 2, cx + s / 2,
                                 cy + s / 2], -1).reshape(-1, 4))
    anchors = jnp.asarray(np.concatenate(anchors).astype(np.float32))
    # a 64-px gt maps to level 0 (anchor_scale*stride0 = 64)
    gtb = jnp.asarray([[0., 0., 30., 30.]])
    res = a.assign(anchors, [16, 4], gtb, jnp.asarray([0]),
                   jnp.asarray([True]), num_classes=1, anchor_scale=4,
                   strides=(8, 16))
    pos = np.asarray(res.pos_mask)
    assert pos[:16].any()       # positives on the mapped level
    assert not pos[16:].any()   # none on the other level


def test_cascade_rpn_train_and_proposals():
    rs = np.random.RandomState(0)
    B, G = 1, 4
    gt = np.zeros((B, G, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    valid = np.zeros((B, G), bool)
    valid[:, 0] = True
    batch = dict(gt_bboxes=jnp.asarray(gt),
                 gt_labels=jnp.zeros((B, G), np.int32),
                 gt_valid=jnp.asarray(valid),
                 img_hw=jnp.asarray([[64., 64.]] * B))
    head = CascadeRPNHead(
        feat_channels=16,
        anchor_generator=dict(ratios=[1.0], scales=[4],
                              strides=[8, 16, 32]))
    sizes = [(8, 8), (4, 4), (2, 2)]
    feats = [jnp.asarray(rs.randn(B, h, w, 16).astype(np.float32))
             for h, w in sizes]
    a1 = [jnp.broadcast_to(m, (B, *m.shape[1:]))
          for m in head._anchor_maps(sizes)]
    v = head.net.init(jax.random.PRNGKey(0), feats, a1, head.strides,
                      coder=head.coder)
    outputs = head.net.apply(v, feats, a1, head.strides, coder=head.coder)
    losses = cascade_rpn_loss(head, outputs, batch, sizes)
    assert set(losses) == {'loss_rpn_reg_s1', 'loss_rpn_reg_s2',
                           'loss_rpn_cls'}
    assert all(np.isfinite(float(x)) for x in losses.values())
    props, pvalid = cascade_rpn_proposals(head, outputs, batch['img_hw'],
                                          max_per_img=20)
    assert props.shape == (B, 20, 4)
    assert np.isfinite(np.asarray(props)).all()
