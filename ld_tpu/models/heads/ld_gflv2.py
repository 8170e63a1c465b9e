"""LDv2 head: localization distillation on a GFLV2 (DGQP) student.

Capability parity with /root/reference/mmdet/models/dense_heads/ld_gflv2.py:44:
identical LD/VLR/imitation terms to LDHead, with two GFLV2-specific twists:
  * teacher outputs are the 3-tuple (cls_score, bbox_pred, cls_feat); the
    classification KD uses the PRE-DGQP raw logits `cls_feat` on both sides
    (`_, soft_target, soft_label = soft_teacher`, ld_gflv2.py:326, and
    `loss_kd(cls_feat[pos], soft_label[pos])`, :242-244);
  * GI scores compare the student's probability-valued cls_score against the
    teacher's raw cls_feat WITHOUT sigmoids (ld_gflv2.py:622-624 — a
    reference quirk preserved for parity).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ld_tpu.models.losses.kd_loss import knowledge_distillation_kl_div_loss
from ld_tpu.utils.registry import HEADS
from .gfl_head import flatten_levels
from .gfocal_head import GFocalHead, GFocalHeadNet
from .ld_head import LDHead


@HEADS.register_module()
class LDv2Head(LDHead):

    def __init__(self, num_classes, in_channels, reg_topk=4, reg_channels=64,
                 add_mean=True, **kwargs):
        self.reg_topk = reg_topk
        self.reg_channels = reg_channels
        self.add_mean = add_mean
        kwargs.setdefault('loss_cls', dict(
            type='QualityFocalLoss', use_sigmoid=False, beta=2.0,
            loss_weight=1.0))
        super().__init__(num_classes, in_channels, **kwargs)

    def _build_net(self, dtype):
        return GFocalHeadNet(num_classes=self.num_classes,
                             feat_channels=self.feat_channels,
                             stacked_convs=self.stacked_convs,
                             reg_max=self.reg_max,
                             num_levels=self.num_levels,
                             reg_topk=self.reg_topk,
                             reg_channels=self.reg_channels,
                             add_mean=self.add_mean, dtype=dtype)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        from .gfl_head import GFLHead
        return GFLHead.get_bboxes(self, tuple(outputs[:2]), img_hw,
                                  scale_factor, rescale, cfg, with_nms)

    def _gi_scores(self, cls_flat, soft_label_flat):
        """GFLV2 GI: raw teacher logits minus student probabilities (parity
        with ld_gflv2.py:622-624)."""
        s = jax.lax.stop_gradient(cls_flat)
        t = jax.lax.stop_gradient(soft_label_flat)
        return t - s

    def loss(self, outputs, batch, featmap_sizes, soft_teacher,
             student_feats=None, teacher_feats=None) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds, cls_feats = outputs
        t_cls_scores, t_bbox_preds, t_cls_feats = soft_teacher

        # run the shared LD machinery with: QFL on the probability scores,
        # LD on the distributions, and the GI region fed GFLV2-style scores
        self._v2_cls_feat = flatten_levels(cls_feats).astype(jnp.float32)
        self._v2_soft_feat = flatten_levels(t_cls_feats).astype(jnp.float32)
        losses = super().loss(
            (cls_scores, bbox_preds), batch, featmap_sizes,
            (t_cls_feats, t_bbox_preds),  # soft_label := teacher cls_feat
            student_feats, teacher_feats)

        # replace the cls-KD term: student raw logits vs teacher raw logits
        # (super() computed it on student probabilities vs teacher logits)
        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])
        kd_el = knowledge_distillation_kl_div_loss(
            self._v2_cls_feat, self._v2_soft_feat, reduction='none',
            T=self.loss_kd.T)
        posf = t['pos_mask'].astype(jnp.float32) * \
            t['anchor_valid'].astype(jnp.float32)
        level_id = t['level_id']
        n_pos_level = jax.ops.segment_sum(
            posf.sum(axis=0), level_id, num_segments=self.num_levels)
        per_anchor_norm = jnp.maximum(n_pos_level, 1.0)[level_id]
        losses['loss_kd'] = self.loss_kd.loss_weight * (
            kd_el * posf / per_anchor_norm[None, :]).sum()
        del self._v2_cls_feat, self._v2_soft_feat
        return losses

    def _gi_mask(self, cls_flat, soft_label_flat, pred_flat, soft_pred_flat,
                 centers, gi_candidates=512, gi_top=10):
        """Override: v2 GI uses raw score difference without sigmoids."""
        from ld_tpu.ops import distance2bbox, integral
        from ld_tpu.ops.nms import nms
        z = self._gi_scores(cls_flat, soft_label_flat)
        gi_score = jnp.abs(z).max(axis=-1)
        cls_idx = jnp.abs(z).argmax(axis=-1)
        teacher_bigger = jnp.take_along_axis(z, cls_idx[:, None],
                                             axis=-1)[:, 0] >= 0
        sbox = distance2bbox(centers, integral(pred_flat, self.reg_max))
        tbox = distance2bbox(centers, integral(soft_pred_flat, self.reg_max))
        gibox = jax.lax.stop_gradient(
            jnp.where(teacher_bigger[:, None], tbox, sbox))
        n = gi_score.shape[0]
        k = min(gi_candidates, n)
        cand_scores, cand_idx = jax.lax.top_k(gi_score, k)
        idx, valid = nms(gibox[cand_idx], cand_scores, 0.3, gi_top)
        mask = jnp.zeros((n, ), jnp.float32)
        mask = mask.at[cand_idx[idx]].max(valid.astype(jnp.float32))
        return mask
