"""RetinaNet head with GFL distributional regression, plus its LD variant.

Capability parity:
  * RetinaGFLHead — /root/reference/mmdet/models/dense_heads/retina_gfl_head.py:50:
    9 anchors/location (octave 4 x 3 scales x 3 ratios), plain conv towers
    (no GN, no per-level Scale), FocalLoss cls, GIoU on integral-decoded
    boxes (reg_decoded_bbox), MaxIoU assignment. No DFL term.
  * LDRetinaHead — /root/reference/mmdet/models/dense_heads/ld_retina.py:13:
    LD KL over the WHOLE 4*(reg_max+1) distribution vector (not per-side,
    unlike LDHead — ld_retina.py:109-110), main weight = max cls sigmoid x
    pos flag, VLR LD scaled 0.03 with VLR weights zeroed on positives
    (ld_retina.py:100-112), per-level-normalized cls KD; carries its own
    `get_vlr_region` (same ATSS-band algorithm -> we reuse ATSSAssigner's).

Multi-anchor layout: conv outputs (B, H, W, A*C) flatten anchor-major to
(B, H*W*A, C), matching grid_anchors' (position, anchor) row order.
"""
from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.ops import anchor_center, distance2bbox, integral, ATSSAssigner
from ld_tpu.ops.nms import multiclass_nms, multiclass_nms_voting
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import GFLHead, _CLS_BIAS_INIT


def flatten_levels_anchors(xs: Sequence[jnp.ndarray], per_anchor: int
                           ) -> jnp.ndarray:
    """[(B, H, W, A*c)] -> (B, sum(H*W*A), c).

    Resharded to batch-only layout under an sp trace (one all-gather over
    'sp' here keeps all loss math in the dp layout — act_sharding.py)."""
    from ld_tpu.utils.act_sharding import reshard_for_loss
    b = xs[0].shape[0]
    return reshard_for_loss(jnp.concatenate([
        x.reshape(b, -1, per_anchor) for x in xs
    ], axis=1))


class RetinaGFLHeadNet(nn.Module):
    num_classes: int
    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cls_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'cls_conv{i}') for i in range(self.stacked_convs)
        ]
        self.reg_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'reg_conv{i}') for i in range(self.stacked_convs)
        ]
        self.retina_cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3),
            padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(_CLS_BIAS_INIT),
            name='retina_cls')
        self.retina_reg = nn.Conv(
            self.num_anchors * 4 * (self.reg_max + 1), (3, 3),
            padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name='retina_reg')

    def __call__(self, feats, train: bool = False):
        cls_scores, bbox_preds = [], []
        for x in feats:
            cls_feat, reg_feat = x, x
            for conv in self.cls_convs:
                cls_feat = nn.relu(conv(cls_feat))
            for conv in self.reg_convs:
                reg_feat = nn.relu(conv(reg_feat))
            cls_scores.append(
                self.retina_cls(cls_feat).astype(jnp.float32))
            bbox_preds.append(
                self.retina_reg(reg_feat).astype(jnp.float32))
        return cls_scores, bbox_preds


@HEADS.register_module()
class RetinaGFLHead(GFLHead):

    def __init__(self, num_classes, in_channels, loss_cls=None,
                 reg_decoded_bbox=True, bbox_coder=None, **kwargs):
        loss_cls = loss_cls or dict(type='FocalLoss', use_sigmoid=True,
                                    gamma=2.0, alpha=0.25, loss_weight=1.0)
        kwargs.setdefault('anchor_generator', dict(
            octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128]))
        self.reg_decoded_bbox = reg_decoded_bbox
        super().__init__(num_classes, in_channels, loss_cls=loss_cls,
                         **kwargs)
        self.num_anchors = self.anchor_generator.num_base_anchors[0]
        # rebuild the net now that num_anchors is known
        self.net = self._build_net(self._dtype)

    def _build_net(self, dtype):
        self._dtype = dtype
        return RetinaGFLHeadNet(
            num_classes=self.num_classes,
            num_anchors=getattr(self, 'num_anchors', 9),
            feat_channels=self.feat_channels,
            stacked_convs=self.stacked_convs, reg_max=self.reg_max,
            dtype=dtype)

    def _flatten(self, cls_scores, bbox_preds):
        cls = flatten_levels_anchors(cls_scores, self.cls_out_channels)
        pred = flatten_levels_anchors(bbox_preds, 4 * (self.reg_max + 1))
        return cls.astype(jnp.float32), pred.astype(jnp.float32)

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        cls_flat, pred_flat = self._flatten(*outputs)
        core = self._retina_core(cls_flat, pred_flat, t)
        return {k: core[k] for k in ('loss_cls', 'loss_bbox')}

    def _retina_core(self, cls_flat, pred_flat, t):
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

        centers = anchor_center(anchors)[None] / strides[None, :, None]
        decoded = distance2bbox(centers, integral(pred_flat, self.reg_max))
        target_boxes = t['bbox_targets'] / strides[None, :, None]
        loss_bbox = self.loss_bbox(decoded.reshape(-1, 4),
                                   target_boxes.reshape(-1, 4),
                                   weight=posf.reshape(-1),
                                   avg_factor=num_total_samples)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, pos=pos,
                    posf=posf, label_weights=label_weights,
                    num_total_samples=num_total_samples, cls_flat=cls_flat,
                    pred_flat=pred_flat)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        nms_pre = cfg.get('nms_pre', 1000)
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)

        def per_image(cls_list, pred_list, hw, sf):
            boxes_all, scores_all = [], []
            for lvl in range(self.num_levels):
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1, self.cls_out_channels))
                stride = float(self.anchor_generator.strides[lvl][0])
                dist = integral(
                    pred_list[lvl].reshape(-1, 4 * (self.reg_max + 1)),
                    self.reg_max) * stride
                anchors = mlvl_anchors[lvl]
                n = scores.shape[0]
                if nms_pre > 0 and n > nms_pre:
                    _, topk = jax.lax.top_k(scores.max(axis=-1), nms_pre)
                    scores, dist, anchors = (scores[topk], dist[topk],
                                             anchors[topk])
                boxes_all.append(distance2bbox(anchor_center(anchors), dist,
                                               max_shape=hw))
                scores_all.append(scores)
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(boxes, scores, cfg.get('score_thr', 0.05),
                                  cfg.get('nms', {}).get('iou_threshold',
                                                         0.6),
                                  max_per_img=cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)([c for c in cls_scores],
                                   [p for p in bbox_preds], img_hw,
                                   scale_factor)


@HEADS.register_module()
class LDRetinaHead(RetinaGFLHead):

    def __init__(self, num_classes, in_channels, loss_ld=None, loss_kd=None,
                 **kwargs):
        super().__init__(num_classes, in_channels, **kwargs)
        self.loss_ld = LOSSES.build(loss_ld or dict(
            type='KnowledgeDistillationKLDivLoss', loss_weight=5, T=10))
        self.loss_kd = LOSSES.build(loss_kd or dict(
            type='KnowledgeDistillationKLDivLoss', loss_weight=10, T=8))
        # VLR band uses the ATSS statistics even under MaxIoU assignment
        # (ld_retina.py:317 carries its own copy of the same algorithm)
        self._vlr_assigner = ATSSAssigner(topk=9)

    def loss(self, outputs, batch, featmap_sizes, soft_teacher,
             student_feats=None, teacher_feats=None):
        from ld_tpu.models.losses.kd_loss import (
            knowledge_distillation_kl_div_loss)
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        anchors, num_lvl = t['anchors'], t['num_level_anchors']

        vlr = jax.vmap(lambda gtb, gtv, vf: self._vlr_assigner.get_vlr_region(
            anchors, num_lvl, gtb, gtv, vf))(
                batch['gt_bboxes'], batch['gt_valid'], t['anchor_valid'])

        cls_flat, pred_flat = self._flatten(outputs[0], outputs[1])
        core = self._retina_core(cls_flat, pred_flat, t)
        losses = dict(loss_cls=core['loss_cls'], loss_bbox=core['loss_bbox'])

        soft_label = flatten_levels_anchors(
            soft_teacher[0], self.cls_out_channels).astype(jnp.float32)
        soft_target = flatten_levels_anchors(
            soft_teacher[1], 4 * (self.reg_max + 1)).astype(jnp.float32)

        # KL over the whole 4*(reg_max+1) vector (ld_retina.py:109)
        kd_box = knowledge_distillation_kl_div_loss(
            pred_flat, soft_target, reduction='none', T=self.loss_ld.T)
        max_sig = jax.lax.stop_gradient(jax.nn.sigmoid(cls_flat)).max(-1)
        pos_weights = max_sig * core['posf']
        losses['loss_ld'] = self.loss_ld.loss_weight * (
            kd_box * pos_weights).sum() / 4.0
        vlr_weights = jnp.where(core['pos'], 0.0, vlr)  # positives excluded
        losses['loss_ld_vlr'] = 0.03 * self.loss_ld.loss_weight * (
            kd_box * vlr_weights).sum() / 4.0

        kd_el = knowledge_distillation_kl_div_loss(
            cls_flat, soft_label, reduction='none', T=self.loss_kd.T)
        level_id = t['level_id']
        n_pos_level = jax.ops.segment_sum(core['posf'].sum(axis=0), level_id,
                                          num_segments=self.num_levels)
        per_anchor_norm = jnp.maximum(n_pos_level, 1.0)[level_id]
        losses['loss_cls_kd'] = self.loss_kd.loss_weight * (
            kd_el * core['posf'] / per_anchor_norm[None, :]).sum()
        return losses
