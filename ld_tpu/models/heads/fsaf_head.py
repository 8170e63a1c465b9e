"""FSAF head (anchor-free feature selection, online level assignment).

Parity: /root/reference/mmdet/models/dense_heads/fsaf_head.py:15 — one
anchor per cell, TBLR box coding (normalizer 4, relu'd + clamped preds),
center-region assignment (pos_scale-shrunk gt = positive, neg_scale band =
ignored), and ONLINE FEATURE SELECTION: each gt's per-level mean loss
(cls + reg over its positive anchors) picks one pyramid level
(`collect_loss_level_single` / argmin, reference :270-310); positives at
other levels are dropped from BOTH loss terms (`reweight_loss_single`).

TPU re-design: the reference's per-gt index juggling becomes a dense
(B, G, L) loss table built with segment-sums over the flattened anchor
axis; the reweighting is a per-anchor boolean `level == best_level[gt]`.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ld_tpu.ops.extra_assigners import CenterRegionAssigner
from ld_tpu.utils.registry import HEADS
from .retina_head import RetinaHead, RetinaHeadNet
from .retina_gfl_head import flatten_levels_anchors


@HEADS.register_module()
class FSAFHead(RetinaHead):

    def __init__(self, num_classes, in_channels, bbox_coder=None,
                 loss_cls=None, loss_bbox=None, score_threshold=None,
                 **kwargs):
        kwargs.setdefault('anchor_generator', dict(
            octave_base_scale=1, scales_per_octave=1, ratios=[1.0],
            strides=[8, 16, 32, 64, 128]))
        super().__init__(
            num_classes, in_channels,
            bbox_coder=bbox_coder or dict(type='TBLRBBoxCoder',
                                          normalizer=4.0),
            loss_cls=loss_cls or dict(type='FocalLoss', use_sigmoid=True,
                                      gamma=2.0, alpha=0.25,
                                      loss_weight=1.0),
            loss_bbox=loss_bbox or dict(type='IoULoss', eps=1e-6,
                                        loss_weight=1.0),
            **kwargs)
        a_cfg = dict(self.train_cfg.get('assigner', dict(
            pos_scale=0.2, neg_scale=0.2, min_pos_iof=0.01)))
        a_cfg.pop('type', None)
        self.assigner = CenterRegionAssigner(**a_cfg)
        self.score_threshold = score_threshold

    def _build_net(self, dtype):
        self._dtype = dtype
        return RetinaHeadNet(num_classes=self.num_classes, num_anchors=1,
                             feat_channels=self.feat_channels,
                             stacked_convs=self.stacked_convs, dtype=dtype)

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        anchors, num_lvl, strides, level_id = self.level_geometry(
            featmap_sizes)
        num_levels = len(num_lvl)
        gt_bboxes, gt_labels, gt_valid = (batch['gt_bboxes'],
                                          batch['gt_labels'],
                                          batch['gt_valid'])

        def assign_single(gtb, gtl, gtv, hw):
            vf = jnp.concatenate(
                self.anchor_generator.valid_flags(featmap_sizes, hw))
            res = self.assigner.assign(anchors, num_lvl, gtb, gtl, gtv, vf,
                                       num_classes=self.num_classes)
            ignore = res.max_overlaps == -1.0
            return (res.labels, res.pos_mask, res.assigned_gt_inds, ignore,
                    vf)

        labels, pos, gt_inds, ignore, valid = jax.vmap(assign_single)(
            gt_bboxes, gt_labels, gt_valid, batch['img_hw'])

        cls_flat = flatten_levels_anchors(
            outputs[0], self.cls_out_channels).astype(jnp.float32)
        # relu + clamp: TBLR energies must be positive (fsaf_head.py:59,205)
        reg_flat = jnp.maximum(
            flatten_levels_anchors(outputs[1], 4).astype(jnp.float32), 1e-4)

        safe = jnp.clip(gt_inds, 0)
        tgt_boxes = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)
        decoded = self.coder.decode(anchors[None], reg_flat)

        posf = pos.astype(jnp.float32)
        # per-anchor raw losses (reduction 'none')
        cls_none = self.loss_cls(cls_flat, labels,
                                 reduction_override='none').sum(-1)
        bbox_none = self.loss_bbox(decoded.reshape(-1, 4),
                                   tgt_boxes.reshape(-1, 4),
                                   reduction_override='none'
                                   ).reshape(pos.shape)

        # (B, G, L) per-gt per-level mean positive loss
        b, n = pos.shape
        g = gt_bboxes.shape[1]
        onehot_gt = (safe[:, :, None] == jnp.arange(g)[None, None, :]) & \
            pos[:, :, None]                                       # (B,N,G)
        onehot_lvl = level_id[None, :, None] == \
            jnp.arange(num_levels)[None, None, :]                 # (1,N,L)
        sel = onehot_gt[:, :, :, None] & onehot_lvl[:, :, None, :]
        per_anchor = (cls_none + bbox_none)[:, :, None, None]
        cnt = sel.sum(axis=1).astype(jnp.float32)                 # (B,G,L)
        tab = jnp.where(cnt > 0,
                        (per_anchor * sel).sum(axis=1) / jnp.maximum(cnt, 1),
                        1e6)
        best_level = tab.argmin(axis=-1)                          # (B,G)
        # keep positives only at their gt's best level
        anchor_best = jnp.take_along_axis(best_level, safe, axis=1)  # (B,N)
        keep = pos & (level_id[None, :] == anchor_best)
        keepf = keep.astype(jnp.float32)

        num_pos = jnp.maximum(keepf.sum(), 1.0)
        # cls: negatives (not ignored) + selected positives
        neg_w = valid.astype(jnp.float32) * (1.0 - posf) * \
            (1.0 - ignore.astype(jnp.float32))
        cls_w = neg_w + keepf
        loss_cls = (cls_none * cls_w).sum() / num_pos
        loss_bbox = (bbox_none * keepf).sum() / num_pos
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cls_scores, bbox_preds = outputs
        bbox_preds = [jnp.maximum(p, 1e-4) for p in bbox_preds]
        return super().get_bboxes((cls_scores, bbox_preds), img_hw,
                                  scale_factor, rescale, cfg, with_nms)
