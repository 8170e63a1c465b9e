"""Cascade RPN head (two-stage anchor refinement with adaptive convs).

Parity: /root/reference/mmdet/models/dense_heads/cascade_rpn_head.py —
stage 1: a single square anchor per cell, RegionAssigner (center-region on
the scale-mapped level), NO classification branch, IoU-style reg loss via
delta coding; its refined boxes become stage 2's anchors, assigned by
MaxIoU with classification. Each stage runs an ADAPTIVE conv: a deformable
3x3 whose offsets place the taps on the current anchor box (the
"alignment" trick replacing the reference's mmcv adaptive conv kernel).
Inference: stage-2 objectness + refined boxes -> proposals.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops.anchors import AnchorGenerator
from ld_tpu.ops.coder import build_coder
from ld_tpu.ops.deform_conv import DeformConv
from ld_tpu.ops.extra_assigners import RegionAssigner
from ld_tpu.ops.max_iou_assigner import MaxIoUAssigner
from ld_tpu.utils.registry import HEADS, LOSSES


def anchor_offsets(anchors_map, stride):
    """3x3 tap offsets that spread over the anchor box.

    anchors_map: (B, H, W, 4) anchors in image coords. Returns
    (B, H, W, 18) (dy, dx) offsets relative to the regular grid.
    """
    w = (anchors_map[..., 2] - anchors_map[..., 0]) / stride
    h = (anchors_map[..., 3] - anchors_map[..., 1]) / stride
    cx = (anchors_map[..., 0] + anchors_map[..., 2]) / 2 / stride
    cy = (anchors_map[..., 1] + anchors_map[..., 3]) / 2 / stride
    b, hh, ww = w.shape
    gx = jnp.arange(ww, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(hh, dtype=jnp.float32)[None, :, None]
    dcx = cx - gx
    dcy = cy - gy
    taps = []
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            # tap at anchor center + k*(extent/2) minus the regular grid
            # tap at cell + k  =>  offset = dc + k*(extent/2 - 1)
            taps.append(dcy + ky * (h / 2 - 1.0))   # dy
            taps.append(dcx + kx * (w / 2 - 1.0))   # dx
    return jnp.stack(taps, -1)


class CascadeRPNNet(nn.Module):
    feat_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, anchors_maps_s1, strides, train: bool = False):
        """Returns stage1 (reg) and a callable for stage2 given offsets."""
        s1_conv = DeformConv(self.feat_channels, dtype=self.dtype,
                             name='s1_adapt')
        s1_reg = nn.Conv(4, (1, 1), dtype=self.dtype,
                         kernel_init=nn.initializers.normal(0.01),
                         name='s1_reg')
        s2_conv = DeformConv(self.feat_channels, dtype=self.dtype,
                             name='s2_adapt')
        s2_cls = nn.Conv(1, (1, 1), dtype=self.dtype,
                         kernel_init=nn.initializers.normal(0.01),
                         name='s2_cls')
        s2_reg = nn.Conv(4, (1, 1), dtype=self.dtype,
                         kernel_init=nn.initializers.normal(0.01),
                         name='s2_reg')
        stage1_reg = []
        feats1 = []
        for lvl, x in enumerate(feats):
            off = anchor_offsets(anchors_maps_s1[lvl], strides[lvl])
            f = nn.relu(s1_conv(x, off))
            feats1.append(f)
            stage1_reg.append(s1_reg(f).astype(jnp.float32))

        def stage2(anchors_maps_s2):
            cls_out, reg_out = [], []
            for lvl, x in enumerate(feats):
                off = anchor_offsets(anchors_maps_s2[lvl], strides[lvl])
                f = nn.relu(s2_conv(x, off))
                cls_out.append(s2_cls(f).astype(jnp.float32))
                reg_out.append(s2_reg(f).astype(jnp.float32))
            return cls_out, reg_out

        return stage1_reg, stage2


@HEADS.register_module()
class CascadeRPNHead:
    """Drives the two stages inside one apply (the net returns a stage-2
    closure so both stages share one parameter tree)."""

    num_classes = 1

    def __init__(self, in_channels=256, feat_channels=256,
                 anchor_generator=None, train_cfg=None, test_cfg=None,
                 dtype=jnp.float32, **kwargs):
        ag = dict(anchor_generator or dict(
            ratios=[1.0], scales=[8], strides=[8, 16, 32, 64]))
        ag.pop('type', None)
        self.anchor_generator = AnchorGenerator(**ag)
        self.strides = tuple(
            s if np.isscalar(s) else s[0]
            for s in ag.get('strides', (8, 16, 32, 64)))
        self.anchor_scale = (ag.get('scales') or [8])[0]
        self.coder = build_coder(dict(
            type='DeltaXYWHBBoxCoder', target_means=[0.] * 4,
            target_stds=[0.1, 0.1, 0.5, 0.5]))
        self.loss_reg = LOSSES.build(dict(type='IoULoss', linear=True,
                                          loss_weight=10.0))
        self.loss_cls = LOSSES.build(dict(type='CrossEntropyLoss',
                                          use_sigmoid=True,
                                          loss_weight=1.0))
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(nms_pre=1000, max_per_img=300,
                                         nms=dict(iou_threshold=0.7))
        self.region_assigner = RegionAssigner()
        self.iou_assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.7,
                                           min_pos_iou=0.3)
        self.net = _CascadeRPNDriver(feat_channels=feat_channels,
                                     dtype=dtype)

    def _anchor_maps(self, featmap_sizes):
        per_lvl = self.anchor_generator.grid_anchors(featmap_sizes)
        return [a.reshape(1, h, w, 4) for a, (h, w) in zip(per_lvl,
                                                           featmap_sizes)]

    def forward(self, variables, feats, train=False):
        featmap_sizes = [f.shape[1:3] for f in feats]
        b = feats[0].shape[0]
        a1 = [jnp.broadcast_to(m, (b, *m.shape[1:]))
              for m in self._anchor_maps(featmap_sizes)]
        return self.net.apply(variables, feats, a1,
                              self.strides, train,
                              coder=self.coder)


class _CascadeRPNDriver(nn.Module):
    feat_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, anchors_s1, strides, train=False, coder=None):
        stage1_reg, stage2 = CascadeRPNNet(
            feat_channels=self.feat_channels, dtype=self.dtype,
            name='rpn')(feats, anchors_s1, strides, train)
        refined = []
        for lvl, reg in enumerate(stage1_reg):
            b, h, w, _ = reg.shape
            a = anchors_s1[lvl].reshape(-1, 4)
            r = coder.decode(jnp.broadcast_to(a[None], (b, a.shape[0], 4)),
                             reg.reshape(b, -1, 4))
            refined.append(jax.lax.stop_gradient(
                r.reshape(b, h, w, 4)))
        cls2, reg2 = stage2(refined)
        return stage1_reg, refined, cls2, reg2


# ---- loss / proposals driven on the head object ---------------------------
def _flatten_maps(maps, c):
    b = maps[0].shape[0]
    return jnp.concatenate([m.reshape(b, -1, c) for m in maps], 1)


def cascade_rpn_loss(head, outputs, batch, featmap_sizes):
    """Losses for both stages (see CascadeRPNHead docstring)."""
    from ld_tpu.ops.boxes import bbox_overlaps  # noqa: F401
    stage1_reg, refined, cls2, reg2 = outputs
    anchors = jnp.concatenate(
        head.anchor_generator.grid_anchors(featmap_sizes))
    num_lvl = head.anchor_generator.num_level_anchors(featmap_sizes)
    b = cls2[0].shape[0]
    reg1_flat = _flatten_maps(stage1_reg, 4)
    ref_flat = _flatten_maps(refined, 4)
    cls2_flat = _flatten_maps(cls2, 1)[..., 0]
    reg2_flat = _flatten_maps(reg2, 4)

    def single(gtb, gtl, gtv, ref, r1, r2):
        res1 = head.region_assigner.assign(
            anchors, num_lvl, gtb, gtl, gtv, num_classes=1,
            anchor_scale=head.anchor_scale, strides=head.strides)
        safe1 = jnp.clip(res1.assigned_gt_inds, 0)
        dec1 = head.coder.decode(anchors, r1)
        pos1 = res1.pos_mask.astype(jnp.float32)
        l1 = head.loss_reg(dec1, gtb[safe1], weight=pos1,
                           avg_factor=jnp.maximum(pos1.sum(), 1.0))
        res2 = head.iou_assigner.assign(
            jax.lax.stop_gradient(ref), num_lvl, gtb, gtl, gtv,
            num_classes=1)
        safe2 = jnp.clip(res2.assigned_gt_inds, 0)
        pos2 = res2.pos_mask.astype(jnp.float32)
        dec2 = head.coder.decode(ref, r2)
        l2 = head.loss_reg(dec2, gtb[safe2], weight=pos2,
                           avg_factor=jnp.maximum(pos2.sum(), 1.0))
        lab = res2.pos_mask.astype(jnp.float32)
        return l1, l2, lab, pos2

    l1, l2, labs, pos2 = jax.vmap(single)(
        batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
        ref_flat, reg1_flat, reg2_flat)
    n2 = jnp.maximum(pos2.sum(), 1.0)
    bce = jnp.maximum(cls2_flat, 0) - cls2_flat * labs + \
        jnp.log1p(jnp.exp(-jnp.abs(cls2_flat)))
    loss_cls = bce.sum() / jnp.maximum(labs.size / 1.0, 1.0)
    return dict(loss_rpn_reg_s1=l1.mean(), loss_rpn_reg_s2=l2.mean(),
                loss_rpn_cls=loss_cls)


def cascade_rpn_proposals(head, outputs, img_hw, max_per_img=None):
    """Stage-2 objectness + boxes -> (B, P, 4) proposals + validity."""
    from ld_tpu.ops.nms import multiclass_nms
    _, refined, cls2, reg2 = outputs
    ref_flat = _flatten_maps(refined, 4)
    cls_flat = jax.nn.sigmoid(_flatten_maps(cls2, 1)[..., 0])
    reg_flat = _flatten_maps(reg2, 4)
    boxes = head.coder.decode(ref_flat, reg_flat)
    k = max_per_img or head.test_cfg.get('max_per_img', 300)

    def per_image(bx, sc, hw):
        dets, _, n = multiclass_nms(
            bx, sc[:, None], 0.0,
            head.test_cfg.get('nms', {}).get('iou_threshold', 0.7),
            max_per_img=k)
        return dets[:, :4], dets[:, 4] > 0

    return jax.vmap(per_image)(boxes, cls_flat, img_hw)
