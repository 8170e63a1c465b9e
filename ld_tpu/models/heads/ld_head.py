"""LD head: localization distillation on top of the GFL head.

Capability parity with /root/reference/mmdet/models/dense_heads/ld_head.py:44:
  * main-region LD: KL between student and teacher bbox-distribution logits
    on positive anchors, weighted by the student's max cls sigmoid
    (ld_head.py:235-239);
  * VLR LD: the same KL on valuable-localization-region anchors, weighted by
    the assigner-returned VLR IoU (ld_head.py:254-266);
  * classification KD on positive anchors, normalized per level by that
    level's positive count (ld_head.py:240-244);
  * feature imitation in 4 modes — fitnet / finegrained / decouple / gibox
    (ld_head.py:580-638) — as masked per-level MSE.

TPU-first: all region selections are dense boolean/float masks over the
flattened (batch, anchors) axis; the per-level KD normalization uses a
static per-anchor level-id segment-sum instead of a python level loop; the
GI-region NMS runs on a fixed top-k candidate set (the reference runs CUDA
NMS over every anchor of a level — the greedy picks live in the top scores,
so a 512-candidate prefix is exact in practice).

Note (reference quirk, preserved): the GI / imitation NMS pools boxes of the
WHOLE batch of one level into a single NMS, mixing images' coordinate spaces
— we match that behaviour for parity.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ld_tpu.ops import anchor_center, bbox_overlaps, distance2bbox, integral
from ld_tpu.ops.nms import nms
from ld_tpu.models.losses.kd_loss import knowledge_distillation_kl_div_loss
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import GFLHead, flatten_levels


@HEADS.register_module()
class LDHead(GFLHead):

    def __init__(self,
                 num_classes,
                 in_channels,
                 loss_ld=None,
                 loss_ld_vlr=None,
                 loss_kd=None,
                 loss_im=None,
                 imitation_method='gibox',
                 gi_candidates=512,
                 gi_top=10,
                 **kwargs):
        super().__init__(num_classes, in_channels, **kwargs)
        # GI-region NMS candidate prefix: the reference NMS-es EVERY anchor
        # of a level (ld_head.py:637); here the greedy NMS runs on the
        # gi_candidates highest GI scores (top-k), which is exact whenever
        # the <=gi_top greedy picks live inside the prefix — true for
        # realistic score fields (see tests/test_gi_region.py) and
        # guaranteed by setting gi_candidates >= the level's anchor count.
        self.gi_candidates = gi_candidates
        self.gi_top = gi_top
        self.loss_ld = LOSSES.build(loss_ld or dict(
            type='KnowledgeDistillationKLDivLoss', loss_weight=0.25, T=10))
        self.loss_ld_vlr = LOSSES.build(loss_ld_vlr or dict(
            type='KnowledgeDistillationKLDivLoss', loss_weight=0.25, T=10))
        self.loss_kd = LOSSES.build(loss_kd or dict(
            type='KnowledgeDistillationKLDivLoss', loss_weight=10, T=2))
        self.loss_im = LOSSES.build(loss_im or dict(type='IMLoss',
                                                    loss_weight=0))
        assert imitation_method in ('gibox', 'finegrained', 'fitnet',
                                    'decouple')
        self.imitation_method = imitation_method

    # ---- imitation regions ---------------------------------------------------
    def _im_region(self, anchors, gt_bboxes, gt_valid):
        """fitnet/decouple ('inside some gt') or finegrained masks, (N,)."""
        centers = anchor_center(anchors)
        in_gt = ((centers[:, None, 0] > gt_bboxes[None, :, 0]) &
                 (centers[:, None, 0] < gt_bboxes[None, :, 2]) &
                 (centers[:, None, 1] > gt_bboxes[None, :, 1]) &
                 (centers[:, None, 1] < gt_bboxes[None, :, 3]) &
                 gt_valid[None, :])
        gt_flag = in_gt.any(axis=1)
        if self.imitation_method != 'finegrained':
            return gt_flag
        iou = bbox_overlaps(anchors, gt_bboxes)          # (N, G)
        max_per_gt = jnp.where(gt_valid, iou.max(axis=0), jnp.inf)
        fine = ((iou > 0.5 * max_per_gt[None, :]) & gt_valid[None, :]).any(
            axis=1)
        return fine

    def build_targets(self, featmap_sizes, gt_bboxes, gt_labels, gt_valid,
                      img_hw):
        t = super().build_targets(featmap_sizes, gt_bboxes, gt_labels,
                                  gt_valid, img_hw)
        anchors = t['anchors']
        num_lvl = t['num_level_anchors']

        def single(gtb, gtv, vf):
            vlr = self.assigner.get_vlr_region(anchors, num_lvl, gtb, gtv, vf)
            # the reference computes im regions over inside-image anchors
            # only and unmaps with fill 0 (ld_head.py _get_target_single)
            im = self._im_region(anchors, gtb, gtv) & vf
            return vlr, im

        vlr, im = jax.vmap(single)(gt_bboxes, gt_valid, t['anchor_valid'])
        t['vlr_region'] = vlr        # (B, N) float weights
        t['im_region'] = im          # (B, N) bool
        return t

    # ---- GI region (needs head outputs) --------------------------------------
    def _gi_mask(self, cls_flat, soft_label_flat, pred_flat, soft_pred_flat,
                 centers, gi_candidates=512, gi_top=10):
        """GI-region mask over a pre-sliced flattened level.

        Parity: /root/reference/mmdet/models/dense_heads/ld_head.py:613-638.
        """
        s_score = jax.lax.stop_gradient(jax.nn.sigmoid(cls_flat))
        t_score = jax.lax.stop_gradient(jax.nn.sigmoid(soft_label_flat))
        z = t_score - s_score
        gi_score = jnp.abs(z).max(axis=-1)
        cls_idx = jnp.abs(z).argmax(axis=-1)
        teacher_bigger = jnp.take_along_axis(z, cls_idx[:, None],
                                             axis=-1)[:, 0] >= 0
        sbox = distance2bbox(centers, integral(pred_flat, self.reg_max))
        tbox = distance2bbox(centers, integral(soft_pred_flat, self.reg_max))
        gibox = jnp.where(teacher_bigger[:, None], tbox, sbox)
        gibox = jax.lax.stop_gradient(gibox)

        n = gi_score.shape[0]
        k = min(gi_candidates, n)
        cand_scores, cand_idx = jax.lax.top_k(gi_score, k)
        idx, valid = nms(gibox[cand_idx], cand_scores, 0.3, gi_top)
        mask = jnp.zeros((n, ), jnp.float32)
        mask = mask.at[cand_idx[idx]].max(valid.astype(jnp.float32))
        return mask  # (n,) 0/1, at most gi_top ones

    # ---- loss ----------------------------------------------------------------
    def loss(self, outputs, batch, featmap_sizes, soft_teacher,
             student_feats=None, teacher_feats=None) -> Dict[str, jnp.ndarray]:
        """Full LD loss.

        Args:
            outputs: student (cls_scores, bbox_preds) per level, NHWC.
            soft_teacher: teacher (cls_scores, bbox_preds) per level
                (stop-gradient applied by the detector).
            student_feats/teacher_feats: FPN features for imitation (optional
                unless loss_im.loss_weight > 0).
        """
        cls_scores, bbox_preds = outputs[0], outputs[1]
        soft_label_lvls, soft_target_lvls = soft_teacher[0], soft_teacher[1]

        t = self.build_targets(featmap_sizes, batch['gt_bboxes'],
                               batch['gt_labels'], batch['gt_valid'],
                               batch['img_hw'])

        cls_flat = flatten_levels(cls_scores).astype(jnp.float32)
        pred_flat = flatten_levels(bbox_preds).astype(jnp.float32)
        soft_label = flatten_levels(soft_label_lvls).astype(jnp.float32)
        soft_target = flatten_levels(soft_target_lvls).astype(jnp.float32)

        core = self._core_losses(cls_flat, pred_flat, t)
        losses = dict(loss_cls=core['loss_cls'], loss_bbox=core['loss_bbox'],
                      loss_dfl=core['loss_dfl'])

        m1 = self.reg_max + 1
        pred_corners = core['pred_corners'].reshape(-1, m1)
        soft_corners = soft_target.reshape(-1, 4, m1).reshape(-1, m1)
        w4 = jnp.broadcast_to(core['weight_targets'][..., None],
                              core['weight_targets'].shape + (4, )).reshape(-1)

        # main-region LD (avg_factor 4.0 per reference ld_head.py:235-239;
        # NOT divided by the global avg_factor)
        losses['loss_ld'] = self.loss_ld(pred_corners, soft_corners,
                                         weight=w4, avg_factor=4.0)

        # VLR LD
        vlr = t['vlr_region']                                  # (B, N)
        vlr4 = jnp.broadcast_to(vlr[..., None],
                                vlr.shape + (4, )).reshape(-1)
        losses['loss_ld_vlr'] = self.loss_ld_vlr(pred_corners, soft_corners,
                                                 weight=vlr4, avg_factor=16.0)

        # classification KD on positives, normalized by each LEVEL's positive
        # count (reference: avg_factor=pos_inds.shape[0] inside the per-level
        # loop, ld_head.py:240-244)
        kd_el = knowledge_distillation_kl_div_loss(
            cls_flat, soft_label, reduction='none',
            T=self.loss_kd.T)                                   # (B, N)
        level_id = t['level_id']                                # (N,)
        posf = core['posf'] * core['label_weights']
        n_pos_level = jax.ops.segment_sum(
            posf.sum(axis=0), level_id, num_segments=self.num_levels)
        per_anchor_norm = jnp.maximum(n_pos_level, 1.0)[level_id]  # (N,)
        losses['loss_kd'] = self.loss_kd.loss_weight * (
            kd_el * posf / per_anchor_norm[None, :]).sum()
        # reference computes a VLR-region KD term but multiplies it by 0
        # (ld_head.py:267-271) — kept as an explicit zero for log parity
        losses['loss_kd_neg'] = jnp.zeros(())

        # feature imitation
        if self.loss_im.loss_weight != 0 and student_feats is None:
            raise ValueError(
                'loss_im has nonzero weight but the detector did not pass '
                'FPN features — set output_feature=True on the KD detector '
                '(the reference fails on the missing argument too)')
        if self.loss_im.loss_weight != 0 and student_feats is not None:
            losses['loss_im'] = self._imitation_loss(
                t, cls_flat, soft_label, pred_flat, soft_target,
                flatten_levels(student_feats).astype(jnp.float32),
                flatten_levels(teacher_feats).astype(jnp.float32))
        else:
            losses['loss_im'] = jnp.zeros(())
        return losses

    def _imitation_loss(self, t, cls_flat, soft_label, pred_flat,
                        soft_target, x, tx):
        """Per-level masked MSE over the selected imitation region.

        x, tx: (B, N, C_feat) flattened FPN features.
        """
        num_lvl = t['num_level_anchors']
        strides = [s[0] for s in self.anchor_generator.strides]
        anchors = t['anchors']
        b, n, cf = x.shape
        total = jnp.zeros(())
        lo = 0
        for lvl, n_lvl in enumerate(num_lvl):
            hi = lo + n_lvl
            xs = x[:, lo:hi].reshape(-1, cf)
            ts = jax.lax.stop_gradient(tx[:, lo:hi].reshape(-1, cf))
            if self.imitation_method == 'gibox':
                centers = anchor_center(anchors[lo:hi]) / strides[lvl]
                centers = jnp.tile(centers, (b, 1))
                mask = self._gi_mask(
                    cls_flat[:, lo:hi].reshape(-1, self.cls_out_channels),
                    soft_label[:, lo:hi].reshape(-1, self.cls_out_channels),
                    pred_flat[:, lo:hi].reshape(-1, pred_flat.shape[-1]),
                    soft_target[:, lo:hi].reshape(-1, pred_flat.shape[-1]),
                    centers, gi_candidates=self.gi_candidates,
                    gi_top=self.gi_top)
                mse = ((xs - ts)**2).mean(axis=-1)
                total = total + (mse * mask).sum() / jnp.maximum(
                    mask.sum(), 1.0)
            else:
                fg = t['im_region'][:, lo:hi].reshape(-1).astype(jnp.float32)
                mse = ((xs - ts)**2).mean(axis=-1)
                fg_term = (mse * fg).sum() / jnp.maximum(fg.sum(), 1.0)
                if self.imitation_method == 'decouple':
                    # reference's decouple branch indexes mismatched fg/bg
                    # sets into F.mse_loss (ld_head.py:177-183), which cannot
                    # execute; implemented here as the DeFeat-style intent:
                    # fg MSE + 2x bg MSE.
                    bg = (1.0 - fg)
                    bg_term = (mse * bg).sum() / jnp.maximum(bg.sum(), 1.0)
                    total = total + fg_term + 2.0 * bg_term
                else:
                    total = total + fg_term
            lo = hi
        return self.loss_im.loss_weight * total
