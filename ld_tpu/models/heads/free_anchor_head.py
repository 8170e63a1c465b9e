"""FreeAnchor RetinaNet head (learning-to-match bag likelihood).

Parity: /root/reference/mmdet/models/dense_heads/free_anchor_retina_head.py:
positive bag per gt = top-`pre_anchor_topk` anchors by IoU; bag probability
is the mean-max of P_cls * P_loc (P_loc = exp(-smoothl1)); loss_pos =
alpha * -log(bag_prob) summed over gts / num_pos. Negative loss is a
focal-modulated BCE on cls_prob * (1 - P{anchor in A+}) over every
(anchor, class), where P{a in A+} is the per-class max of the saturated
IoU ramp ((IoU - thr)/(max-thr)) over gts of that class — computed here
with a segment-max over the gt axis (static shapes; padded gts masked).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ld_tpu.ops.boxes import bbox_overlaps
from ld_tpu.utils.registry import HEADS
from .retina_head import RetinaHead
from .retina_gfl_head import flatten_levels_anchors

EPS = 1e-12


@HEADS.register_module()
class FreeAnchorRetinaHead(RetinaHead):

    def __init__(self, num_classes, in_channels, pre_anchor_topk=50,
                 bbox_thr=0.6, gamma=2.0, alpha=0.5, loss_bbox=None,
                 **kwargs):
        super().__init__(num_classes, in_channels,
                         loss_bbox=loss_bbox or dict(
                             type='SmoothL1Loss', beta=0.11,
                             loss_weight=0.75), **kwargs)
        self.pre_anchor_topk = pre_anchor_topk
        self.bbox_thr = bbox_thr
        self.gamma = gamma
        self.alpha = alpha

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        anchors, _, _, _ = self.level_geometry(featmap_sizes)
        cls_flat = flatten_levels_anchors(
            outputs[0], self.cls_out_channels).astype(jnp.float32)
        reg_flat = flatten_levels_anchors(outputs[1], 4).astype(jnp.float32)
        cls_prob = jax.nn.sigmoid(cls_flat)
        k = min(self.pre_anchor_topk, anchors.shape[0])
        c = self.cls_out_channels

        def single(gtb, gtl, gtv, cls_p, reg_p):
            # ---- negative branch: P{a_j in A+} per (anchor, class) --------
            decoded = jax.lax.stop_gradient(
                self.coder.decode(anchors, reg_p))
            obj_iou = bbox_overlaps(gtb, decoded)          # (G, N)
            t1 = self.bbox_thr
            t2 = jnp.maximum(obj_iou.max(axis=1, keepdims=True), t1 + EPS)
            obj_prob = jnp.clip((obj_iou - t1) / (t2 - t1), 0.0, 1.0)
            obj_prob = jnp.where(gtv[:, None], obj_prob, 0.0)
            seg_ids = jnp.where(gtv, gtl, c)
            box_prob = jax.ops.segment_max(
                obj_prob, seg_ids, num_segments=c + 1,
                indices_are_sorted=False)[:c]              # (C, N)
            box_prob = jnp.maximum(box_prob, 0.0).T        # (N, C)
            box_prob = jax.lax.stop_gradient(box_prob)

            # ---- positive bags ---------------------------------------------
            quality = jnp.where(gtv[:, None],
                                bbox_overlaps(gtb, anchors), -1.0)
            _, matched = jax.lax.top_k(quality, k)         # (G, k)
            m_cls = cls_p[matched]                         # (G, k, C)
            m_cls_prob = jnp.take_along_axis(
                m_cls, jnp.clip(gtl, 0, c - 1)[:, None, None], axis=2
            )[..., 0]                                      # (G, k)
            m_anchors = anchors[matched]                   # (G, k, 4)
            m_targets = self.coder.encode(
                m_anchors, jnp.broadcast_to(gtb[:, None, :],
                                            m_anchors.shape))
            l_bbox = self.loss_bbox(
                reg_p[matched].reshape(-1, 4), m_targets.reshape(-1, 4),
                reduction_override='none').reshape(*matched.shape, 4).sum(-1)
            m_box_prob = jnp.exp(-l_bbox)
            matched_prob = m_cls_prob * m_box_prob
            w = 1.0 / jnp.clip(1.0 - matched_prob, EPS)
            w = w / w.sum(axis=1, keepdims=True)
            bag_prob = (w * matched_prob).sum(axis=1)      # (G,)
            pos_loss = self.alpha * -jnp.log(jnp.clip(bag_prob, EPS))
            pos_loss = jnp.where(gtv, pos_loss, 0.0)

            # ---- negative bag loss -----------------------------------------
            prob = jnp.clip(cls_p * (1.0 - box_prob), EPS, 1.0 - EPS)
            neg = (1.0 - self.alpha) * prob**self.gamma * \
                -jnp.log(1.0 - prob)
            return pos_loss.sum(), neg.sum(), gtv.sum()

        pos_l, neg_l, n_pos = jax.vmap(single)(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            cls_prob, reg_flat)
        num_pos = jnp.maximum(n_pos.sum(), 1)
        return dict(
            positive_bag_loss=pos_l.sum() / num_pos,
            negative_bag_loss=neg_l.sum() /
            jnp.maximum(num_pos * self.pre_anchor_topk, 1))
