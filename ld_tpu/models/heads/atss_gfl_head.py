"""ATSS head with GFL distributional regression (+ centerness branch).

Capability parity with /root/reference/mmdet/models/dense_heads/atss_gfl_head.py:
towers -> (cls via FocalLoss, 4*(reg_max+1) distribution with per-level
Scale, centerness from the reg tower). Loss (atss_gfl_head.py:198-280):
focal cls over all anchors (avg = num_total_samples), GIoU on decoded
distributions weighted by centerness targets (normalized by the global sum
of centerness targets), BCE centerness — note: no DFL term in this variant.

Same dense masked single-kernel formulation as GFLHead (no per-level loop,
no gathers); cross-replica reduce_mean becomes global-batch sums.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops import anchor_center, bbox_overlaps, distance2bbox, integral
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import ConvGNBlock, GFLHead, _CLS_BIAS_INIT, flatten_levels


class ATSSGFLHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    num_levels: int = 5
    dcn_on_last_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        last = self.stacked_convs - 1
        self.cls_convs = [ConvGNBlock(
            self.feat_channels, dtype=self.dtype,
            with_dcn=self.dcn_on_last_conv and i == last,
            name=f'cls_conv{i}') for i in range(self.stacked_convs)]
        self.reg_convs = [ConvGNBlock(
            self.feat_channels, dtype=self.dtype,
            with_dcn=self.dcn_on_last_conv and i == last,
            name=f'reg_conv{i}') for i in range(self.stacked_convs)]
        self.atss_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(_CLS_BIAS_INIT),
            name='atss_cls')
        self.atss_reg = nn.Conv(
            4 * (self.reg_max + 1), (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
            name='atss_reg')
        self.atss_centerness = nn.Conv(
            1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name='atss_centerness')
        self.scales = self.param('scales', nn.initializers.ones,
                                 (self.num_levels, ))

    def __call__(self, feats, train: bool = False):
        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for conv in self.cls_convs:
                cls_feat = conv(cls_feat)
            for conv in self.reg_convs:
                reg_feat = conv(reg_feat)
            cls_scores.append(self.atss_cls(cls_feat).astype(jnp.float32))
            bbox_preds.append((self.atss_reg(reg_feat) *
                               self.scales[lvl]).astype(jnp.float32))
            centernesses.append(
                self.atss_centerness(reg_feat).astype(jnp.float32))
        return cls_scores, bbox_preds, centernesses


def centerness_target(anchors, bbox_targets, pos_mask, eps=1e-6):
    """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) on positive anchors.

    Parity: atss_gfl_head.py:359 (masked form — zeros off the positives)."""
    cx = (anchors[..., 0] + anchors[..., 2]) / 2
    cy = (anchors[..., 1] + anchors[..., 3]) / 2
    l_ = cx - bbox_targets[..., 0]
    t_ = cy - bbox_targets[..., 1]
    r_ = bbox_targets[..., 2] - cx
    b_ = bbox_targets[..., 3] - cy
    lr_min = jnp.minimum(l_, r_)
    lr_max = jnp.maximum(jnp.maximum(l_, r_), eps)
    tb_min = jnp.minimum(t_, b_)
    tb_max = jnp.maximum(jnp.maximum(t_, b_), eps)
    ratio = jnp.clip((lr_min / lr_max) * (tb_min / tb_max), 0.0)
    return jnp.where(pos_mask, jnp.sqrt(ratio), 0.0)


@HEADS.register_module()
class ATSSGFLHead(GFLHead):

    def __init__(self, num_classes, in_channels, loss_centerness=None,
                 loss_cls=None, bbox_coder=None, **kwargs):
        loss_cls = loss_cls or dict(type='FocalLoss', use_sigmoid=True,
                                    gamma=2.0, alpha=0.25, loss_weight=1.0)
        super().__init__(num_classes, in_channels, loss_cls=loss_cls,
                         **kwargs)
        self.loss_centerness = LOSSES.build(loss_centerness or dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0))

    def _build_net(self, dtype):
        return ATSSGFLHeadNet(num_classes=self.num_classes,
                              feat_channels=self.feat_channels,
                              stacked_convs=self.stacked_convs,
                              reg_max=self.reg_max,
                              num_levels=self.num_levels, dtype=dtype)

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        core = self._atss_core(outputs, t)
        return {k: core[k] for k in ('loss_cls', 'loss_bbox',
                                     'loss_centerness')}

    def _atss_core(self, outputs, t):
        cls_scores, bbox_preds, centernesses = outputs
        cls_flat = flatten_levels(cls_scores).astype(jnp.float32)
        pred_flat = flatten_levels(bbox_preds).astype(jnp.float32)
        ctr_flat = flatten_levels(centernesses).astype(jnp.float32)[..., 0]

        labels = t['labels']
        pos = t['pos_mask']
        posf = pos.astype(jnp.float32)
        label_weights = t['anchor_valid'].astype(jnp.float32)
        anchors = t['anchors']
        strides = t['strides']

        # batch-total clamp (reference reduce_mean(num_total_pos).clamp(min=1))
        num_total_samples = jnp.maximum(posf.sum(), 1.0)

        loss_cls = self.loss_cls(cls_flat, labels, weight=label_weights,
                                 avg_factor=num_total_samples)

        ctr_targets = centerness_target(anchors[None], t['bbox_targets'],
                                        pos)
        bbox_avg = jnp.maximum(ctr_targets.sum(), 1e-6)

        centers = anchor_center(anchors)[None] / strides[None, :, None]
        pred_dist = integral(pred_flat, self.reg_max)
        decoded = distance2bbox(centers, pred_dist)
        target_boxes = t['bbox_targets'] / strides[None, :, None]
        loss_bbox = self.loss_bbox(decoded.reshape(-1, 4),
                                   target_boxes.reshape(-1, 4),
                                   weight=ctr_targets.reshape(-1),
                                   avg_factor=bbox_avg)

        # centerness BCE on positives (avg = num_total_samples)
        bce = jnp.maximum(ctr_flat, 0) - ctr_flat * ctr_targets + \
            jnp.log1p(jnp.exp(-jnp.abs(ctr_flat)))
        loss_centerness = self.loss_centerness.loss_weight * (
            bce * posf).sum() / num_total_samples

        weight_targets = jnp.where(
            pos, jax.lax.stop_gradient(jax.nn.sigmoid(cls_flat)).max(-1), 0.0)
        pred_corners = pred_flat.reshape(*pred_flat.shape[:-1], 4,
                                         self.reg_max + 1)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_centerness, pos=pos, posf=posf,
                    label_weights=label_weights, pred_corners=pred_corners,
                    weight_targets=weight_targets,
                    num_total_samples=num_total_samples, cls_flat=cls_flat)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        """ATSS decode: scores = sigmoid(cls) * sigmoid(centerness)."""
        cls_scores, bbox_preds, centernesses = outputs
        fused = [
            # fold centerness into the scores, then reuse the GFL decode
            jax.nn.sigmoid(c) * jax.nn.sigmoid(ctr)
            for c, ctr in zip(cls_scores, centernesses)
        ]
        prev = self.use_sigmoid_cls
        self.use_sigmoid_cls = False  # scores already probabilities
        try:
            return super().get_bboxes((fused, bbox_preds), img_hw,
                                      scale_factor, rescale, cfg, with_nms)
        finally:
            self.use_sigmoid_cls = prev


@HEADS.register_module()
class LDATSSHead(ATSSGFLHead):
    """LD on the ATSS-GFL head.

    Parity: /root/reference/mmdet/models/dense_heads/ld_atss.py:13 —
    main LD (weight = max cls sigmoid, avg 4), VLR LD scaled 0.15 with the
    assigner VLR weights (ld_atss.py:147-162; the `(sigmoid<0)` term there is
    identically zero and omitted), per-level-normalized cls KD;
    `im_region = vlr_region` (ld_atss.py:442).
    """

    def __init__(self, num_classes, in_channels, loss_ld=None, loss_kd=None,
                 **kwargs):
        super().__init__(num_classes, in_channels, **kwargs)
        self.loss_ld = LOSSES.build(loss_ld or dict(
            type='KnowledgeDistillationKLDivLoss', loss_weight=0.25, T=10))
        self.loss_kd = LOSSES.build(loss_kd or dict(
            type='KnowledgeDistillationKLDivLoss', loss_weight=10, T=2))

    def loss(self, outputs, batch, featmap_sizes, soft_teacher,
             student_feats=None, teacher_feats=None):
        from ld_tpu.models.losses.kd_loss import (
            knowledge_distillation_kl_div_loss)
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        anchors, num_lvl = t['anchors'], t['num_level_anchors']

        def single_vlr(gtb, gtv, vf):
            return self.assigner.get_vlr_region(anchors, num_lvl, gtb, gtv,
                                                vf)

        vlr = jax.vmap(single_vlr)(batch['gt_bboxes'], batch['gt_valid'],
                                   t['anchor_valid'])

        core = self._atss_core(outputs, t)
        losses = dict(loss_cls=core['loss_cls'], loss_bbox=core['loss_bbox'],
                      loss_centerness=core['loss_centerness'])

        soft_labels = flatten_levels(soft_teacher[0]).astype(jnp.float32)
        soft_targets = flatten_levels(soft_teacher[1]).astype(jnp.float32)

        m1 = self.reg_max + 1
        pred_corners = core['pred_corners'].reshape(-1, m1)
        soft_corners = soft_targets.reshape(-1, 4, m1).reshape(-1, m1)
        w4 = jnp.broadcast_to(core['weight_targets'][..., None],
                              core['weight_targets'].shape + (4, )
                              ).reshape(-1)
        losses['loss_ld'] = self.loss_ld(pred_corners, soft_corners,
                                         weight=w4, avg_factor=4.0)
        vlr4 = jnp.broadcast_to(vlr[..., None], vlr.shape + (4, )).reshape(-1)
        losses['loss_ld_neg'] = 0.15 * self.loss_ld(
            pred_corners, soft_corners, weight=vlr4, avg_factor=4.0)

        kd_el = knowledge_distillation_kl_div_loss(
            core['cls_flat'], soft_labels, reduction='none',
            T=self.loss_kd.T)
        posf = core['posf'] * core['label_weights']
        level_id = t['level_id']
        n_pos_level = jax.ops.segment_sum(posf.sum(axis=0), level_id,
                                          num_segments=self.num_levels)
        per_anchor_norm = jnp.maximum(n_pos_level, 1.0)[level_id]
        losses['loss_cls_kd'] = self.loss_kd.loss_weight * (
            kd_el * posf / per_anchor_norm[None, :]).sum()
        return losses
