"""MaxIoU assignment as a static-shape op.

Behavioural parity with /root/reference/mmdet/core/bbox/assigners/
max_iou_assigner.py (the classic RetinaNet/FCOS-LD assigner): an anchor is
positive for the gt with its max IoU if >= pos_iou_thr, negative if its max
IoU < neg_iou_thr, ignored in between; each gt additionally claims its own
best anchor(s) when that best IoU >= min_pos_iou (`gt_max_assign_all`).

Dense masked formulation — no `nonzero`, vmap over images.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ld_tpu.utils.registry import ASSIGNERS
from .atss_assigner import AssignResult, INF
from .boxes import bbox_overlaps


@ASSIGNERS.register_module()
class MaxIoUAssigner:

    def __init__(self, pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
                 gt_max_assign_all=True, ignore_iof_thr=-1,
                 match_low_quality=True, **kwargs):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.match_low_quality = match_low_quality

    def assign(self,
               bboxes: jnp.ndarray,
               num_level_anchors: Sequence[int],
               gt_bboxes: jnp.ndarray,
               gt_labels: jnp.ndarray,
               gt_valid: jnp.ndarray,
               valid_mask: jnp.ndarray = None,
               num_classes: int = 80,
               overlaps: jnp.ndarray = None) -> AssignResult:
        """`overlaps` overrides the (N, G) IoU matrix (ApproxMaxIoU path)."""
        num_anchors = bboxes.shape[0]
        if valid_mask is None:
            valid_mask = jnp.ones((num_anchors, ), bool)
        if overlaps is None:
            overlaps = bbox_overlaps(bboxes, gt_bboxes)          # (N, G)
        overlaps = jnp.where(gt_valid[None, :] & valid_mask[:, None],
                             overlaps, -1.0)

        max_overlaps = overlaps.max(axis=1)
        argmax = overlaps.argmax(axis=1)

        pos = max_overlaps >= self.pos_iou_thr
        # low-quality matching: every gt claims its best anchor(s)
        if self.match_low_quality:
            gt_best = overlaps.max(axis=0)                       # (G,)
            claim_ok = (gt_best >= self.min_pos_iou) & gt_valid
            if self.gt_max_assign_all:
                is_best = (overlaps == gt_best[None, :]) & claim_ok[None, :] \
                    & (overlaps > -0.5)
            else:
                best_anchor = overlaps.argmax(axis=0)
                is_best = jnp.zeros_like(overlaps, bool).at[
                    best_anchor, jnp.arange(overlaps.shape[1])].set(True)
                is_best = is_best & claim_ok[None, :]
            # anchors claimed this way are assigned to the claiming gt (the
            # LAST such gt in the reference's sequential loop — emulated by
            # the highest gt index among claimants)
            claimed = is_best.any(axis=1)
            gt_ids = jnp.arange(overlaps.shape[1])
            claim_gt = jnp.where(is_best, gt_ids[None, :], -1).max(axis=1)
            argmax = jnp.where(claimed, claim_gt, argmax)
            pos = pos | claimed

        pos = pos & valid_mask
        labels = jnp.where(pos, gt_labels[jnp.clip(argmax, 0)], num_classes)
        return AssignResult(
            assigned_gt_inds=jnp.where(pos, argmax, -1).astype(jnp.int32),
            max_overlaps=jnp.where(pos, max_overlaps, 0.0),
            labels=labels.astype(jnp.int32),
            pos_mask=pos)
