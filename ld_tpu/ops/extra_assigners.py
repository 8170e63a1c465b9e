"""Additional assigners from the inherited stack.

Parity targets in /root/reference/mmdet/core/bbox/assigners/:
  * HungarianAssigner (DETR set matching; hungarian_assigner.py) — cost =
    cls + L1(normalized boxes) + IoU cost; the reference solves the LAP on
    host via scipy, here the exact Jonker-Volgenant solver in
    ops/matching.py runs fully on device inside jit.
  * PointAssigner (point_assigner.py, RepPoints) — each gt claims the
    nearest points on its scale level.
  * CenterRegion / ApproxMaxIoU / TaskAligned / Grid / Region assigners —
    see each class docstring.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.utils.registry import ASSIGNERS
from .atss_assigner import AssignResult, INF
from .boxes import bbox_overlaps


@ASSIGNERS.register_module()
class HungarianAssigner:

    def __init__(self, cls_cost_weight=1.0, reg_cost_weight=5.0,
                 iou_cost_weight=2.0, **kwargs):
        self.cls_w = cls_cost_weight
        self.reg_w = reg_cost_weight
        self.iou_w = iou_cost_weight

    def assign(self, pred_boxes, pred_logits, gt_bboxes, gt_labels,
               gt_valid, img_hw, num_classes=80) -> AssignResult:
        """One-to-one matching for ONE image — fully on device.

        The reference solves this with scipy on host
        (hungarian_assigner.py); here the exact Jonker-Volgenant solver in
        ops/matching.py runs inside jit (rows = padded gts, cols = queries).

        pred_boxes: (Q, 4) xyxy absolute; pred_logits: (Q, C).
        """
        from .matching import hungarian_lap
        q = pred_boxes.shape[0]
        probs = jax.nn.softmax(pred_logits, axis=-1)
        cls_cost = -probs[:, jnp.clip(gt_labels, 0, num_classes - 1)]
        scale = jnp.asarray([img_hw[1], img_hw[0], img_hw[1], img_hw[0]])
        reg_cost = jnp.abs((pred_boxes / scale)[:, None, :] -
                           (gt_bboxes / scale)[None, :, :]).sum(-1)
        iou_cost = -bbox_overlaps(pred_boxes, gt_bboxes, mode='giou')
        cost = (self.cls_w * cls_cost + self.reg_w * reg_cost +
                self.iou_w * iou_cost)                        # (Q, G)
        col = hungarian_lap(cost.T, gt_valid)                 # (G,) query ix
        hit = (col[None, :] == jnp.arange(q)[:, None]) & \
            (col >= 0)[None, :]                               # (Q, G)
        pos = hit.any(axis=1)
        assigned = jnp.where(pos, hit.argmax(axis=1), -1)
        labels = jnp.where(pos, gt_labels[jnp.clip(assigned, 0)],
                           num_classes)
        ious = bbox_overlaps(pred_boxes, gt_bboxes)
        max_overlaps = jnp.where(
            pos,
            jnp.take_along_axis(ious, jnp.clip(assigned, 0)[:, None],
                                1)[:, 0], 0.0)
        return AssignResult(
            assigned_gt_inds=assigned.astype(jnp.int32),
            max_overlaps=max_overlaps.astype(jnp.float32),
            labels=labels.astype(jnp.int32),
            pos_mask=pos)


@ASSIGNERS.register_module()
class PointAssigner:
    """Each gt claims the `pos_num` nearest points whose level matches the
    gt scale (RepPoints)."""

    def __init__(self, scale=4, pos_num=3, **kwargs):
        self.scale = scale
        self.pos_num = pos_num

    def assign(self, points, num_level_points, gt_bboxes, gt_labels,
               gt_valid, valid_mask=None, num_classes=80) -> AssignResult:
        """points: (N, 3) = (x, y, stride)."""
        n = points.shape[0]
        g = gt_bboxes.shape[0]
        xy = points[:, :2]
        stride = points[:, 2]
        lvl = jnp.log2(stride).astype(jnp.int32)
        gw = jnp.maximum(gt_bboxes[:, 2] - gt_bboxes[:, 0], 1e-6)
        gh = jnp.maximum(gt_bboxes[:, 3] - gt_bboxes[:, 1], 1e-6)
        gt_lvl = jnp.clip(
            (jnp.log2(jnp.sqrt(gw * gh) / self.scale) + 0.5).astype(
                jnp.int32), lvl.min(), lvl.max())
        gc = jnp.stack([(gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2,
                        (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2], -1)
        dist = jnp.linalg.norm(
            (xy[:, None, :] - gc[None, :, :]) / stride[:, None, None],
            axis=-1)
        same_lvl = lvl[:, None] == gt_lvl[None, :]
        dist = jnp.where(same_lvl & gt_valid[None, :], dist, INF)
        # per gt: pos_num nearest points
        from .atss_assigner import _small_topk_min
        idx = _small_topk_min(dist.T, min(self.pos_num, n))     # (G, k)
        claimed = jnp.zeros((n, g), bool).at[
            idx.reshape(-1),
            jnp.repeat(jnp.arange(g), idx.shape[1])].set(True)
        claimed = claimed & (dist < INF / 2)
        d_masked = jnp.where(claimed, dist, INF)
        best = d_masked.argmin(axis=1)
        pos = d_masked.min(axis=1) < INF / 2
        labels = jnp.where(pos, gt_labels[best], num_classes)
        return AssignResult(
            assigned_gt_inds=jnp.where(pos, best, -1).astype(jnp.int32),
            max_overlaps=jnp.where(pos, 1.0, 0.0),
            labels=labels.astype(jnp.int32),
            pos_mask=pos)


@ASSIGNERS.register_module()
class CenterRegionAssigner:
    """Center-region assignment (FSAF/Guided-Anchoring style): anchors whose
    centre lies in the pos_scale-shrunk gt box are positive; the
    ignore_scale-shrunk band is excluded from the negative set; smaller gts
    take precedence on overlaps.

    Parity: /root/reference/mmdet/core/bbox/assigners/center_region_assigner.py.
    Returns AssignResult plus an `ignore` mask via max_overlaps==-1 marking.
    """

    def __init__(self, pos_scale=0.2, neg_scale=0.5, min_pos_iof=1e-2,
                 **kwargs):
        self.pos_scale = pos_scale
        self.neg_scale = neg_scale

    @staticmethod
    def _in_scaled(points, gtb, scale):
        cx = (gtb[:, 0] + gtb[:, 2]) / 2
        cy = (gtb[:, 1] + gtb[:, 3]) / 2
        w = (gtb[:, 2] - gtb[:, 0]) * scale
        h = (gtb[:, 3] - gtb[:, 1]) * scale
        return ((points[:, 0:1] >= (cx - w / 2)[None, :]) &
                (points[:, 0:1] <= (cx + w / 2)[None, :]) &
                (points[:, 1:2] >= (cy - h / 2)[None, :]) &
                (points[:, 1:2] <= (cy + h / 2)[None, :]))

    def assign(self, bboxes, num_level_bboxes, gt_bboxes, gt_labels,
               gt_valid, valid_mask=None, num_classes=80) -> AssignResult:
        n = bboxes.shape[0]
        if valid_mask is None:
            valid_mask = jnp.ones((n, ), bool)
        centers = jnp.stack([(bboxes[:, 0] + bboxes[:, 2]) / 2,
                             (bboxes[:, 1] + bboxes[:, 3]) / 2], -1)
        pos_in = self._in_scaled(centers, gt_bboxes, self.pos_scale) & \
            gt_valid[None, :] & valid_mask[:, None]
        ign_in = self._in_scaled(centers, gt_bboxes, self.neg_scale) & \
            gt_valid[None, :]
        areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * \
            (gt_bboxes[:, 3] - gt_bboxes[:, 1])
        masked = jnp.where(pos_in, areas[None, :], INF)
        best = masked.argmin(axis=1)
        pos = masked.min(axis=1) < INF / 2
        # ignore band: inside some neg_scale region but not positive
        ignore = ign_in.any(axis=1) & ~pos
        labels = jnp.where(pos, gt_labels[best], num_classes)
        # max_overlaps doubles as the ignore marker (-1), matching the
        # reference's shadowed-gt bookkeeping
        overlaps = jnp.where(pos, 1.0, jnp.where(ignore, -1.0, 0.0))
        return AssignResult(
            assigned_gt_inds=jnp.where(pos, best, -1).astype(jnp.int32),
            max_overlaps=overlaps,
            labels=labels.astype(jnp.int32),
            pos_mask=pos)


@ASSIGNERS.register_module()
class ApproxMaxIoUAssigner:
    """Max-IoU assignment where each square anchor is represented by the
    best IoU among its `approxs_per_octave` approx anchors.

    Parity: /root/reference/mmdet/core/bbox/assigners/approx_max_iou_assigner.py
    (SABL / guided anchoring): overlaps(square_i, gt) =
    max_k IoU(approx_{i,k}, gt), then standard MaxIoU thresholds.
    """

    def __init__(self, pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
                 gt_max_assign_all=True, ignore_iof_thr=-1,
                 match_low_quality=True, **kwargs):
        from .max_iou_assigner import MaxIoUAssigner
        self._base = MaxIoUAssigner(
            pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
            min_pos_iou=min_pos_iou, gt_max_assign_all=gt_max_assign_all,
            match_low_quality=match_low_quality)

    def assign(self, squares, num_level_anchors, gt_bboxes, gt_labels,
               gt_valid, valid_mask=None, num_classes=80, approxs=None):
        """approxs: (N, K, 4) approx anchors per square; None -> plain IoU."""
        overlaps = None
        if approxs is not None:
            n, k, _ = approxs.shape
            all_iou = bbox_overlaps(approxs.reshape(n * k, 4), gt_bboxes)
            overlaps = all_iou.reshape(n, k, -1).max(axis=1)
        return self._base.assign(squares, num_level_anchors, gt_bboxes,
                                 gt_labels, gt_valid, valid_mask,
                                 num_classes, overlaps=overlaps)


@ASSIGNERS.register_module()
class TaskAlignedAssigner:
    """TOOD's task-aligned assignment.

    alignment metric t = cls_prob[gt_label]^alpha * IoU(pred, gt)^beta;
    each gt takes its topk candidates (centers inside the gt); an anchor
    claimed by several gts goes to the one with the highest IoU. NOTE: the
    reference bundles tood_head.py but ships NO task_aligned_assigner — its
    TOOD head cannot run there; this is the assigner that head describes.
    """

    def __init__(self, topk=13, alpha=1.0, beta=6.0, **kwargs):
        self.topk = topk
        self.alpha = alpha
        self.beta = beta

    def assign(self, pred_scores, decoded_bboxes, anchors, gt_bboxes,
               gt_labels, gt_valid, valid_mask=None, num_classes=80):
        """pred_scores (N, C) activated probs; decoded_bboxes (N, 4)."""
        n = anchors.shape[0]
        if valid_mask is None:
            valid_mask = jnp.ones((n, ), bool)
        iou = bbox_overlaps(decoded_bboxes, gt_bboxes)        # (N, G)
        cls_g = pred_scores[:, jnp.clip(gt_labels, 0, None)]  # (N, G)
        metric = cls_g**self.alpha * iou**self.beta
        cx = (anchors[:, 0] + anchors[:, 2]) / 2
        cy = (anchors[:, 1] + anchors[:, 3]) / 2
        inside = (cx[:, None] > gt_bboxes[None, :, 0]) & \
            (cx[:, None] < gt_bboxes[None, :, 2]) & \
            (cy[:, None] > gt_bboxes[None, :, 1]) & \
            (cy[:, None] < gt_bboxes[None, :, 3])
        ok = inside & gt_valid[None, :] & valid_mask[:, None]
        metric = jnp.where(ok, metric, -1.0)
        # per-gt topk by metric
        k = min(self.topk, n)
        _, idx = jax.lax.top_k(metric.T, k)                   # (G, k)
        cand = jnp.zeros((n, metric.shape[1]), bool).at[
            idx.reshape(-1),
            jnp.repeat(jnp.arange(metric.shape[1]), k)].set(True)
        cand = cand & (metric > 0)
        # conflicts -> gt with max IoU
        iou_m = jnp.where(cand, iou, -1.0)
        best = iou_m.argmax(axis=1)
        pos = iou_m.max(axis=1) > 0
        labels = jnp.where(pos, gt_labels[best], num_classes)
        align = jnp.where(cand, metric, 0.0)
        return AssignResult(
            assigned_gt_inds=jnp.where(pos, best, -1).astype(jnp.int32),
            max_overlaps=jnp.where(pos, iou_m.max(axis=1), 0.0),
            labels=labels.astype(jnp.int32),
            pos_mask=pos), align


@ASSIGNERS.register_module()
class GridAssigner:
    """YOLO grid assignment: MaxIoU thresholds restricted to the anchors of
    the gt's responsible cell. Parity:
    /root/reference/mmdet/core/bbox/assigners/grid_assigner.py."""

    def __init__(self, pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.0,
                 gt_max_assign_all=True, **kwargs):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all

    def assign(self, bboxes, box_responsible_flags, gt_bboxes, gt_labels,
               gt_valid, num_classes=80):
        """box_responsible_flags: (N, G) bool — anchor responsible for gt."""
        overlaps = bbox_overlaps(bboxes, gt_bboxes)
        overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
        resp = box_responsible_flags & gt_valid[None, :]
        ov_resp = jnp.where(resp, overlaps, -1.0)
        max_ov = ov_resp.max(axis=1)
        argmax = ov_resp.argmax(axis=1)
        pos = max_ov >= self.pos_iou_thr
        # each gt claims its best responsible anchor
        gt_best = ov_resp.max(axis=0)
        claim_ok = (gt_best >= self.min_pos_iou) & gt_valid
        is_best = (ov_resp == gt_best[None, :]) & claim_ok[None, :] & resp \
            & (ov_resp > -0.5)
        claimed = is_best.any(axis=1)
        claim_gt = jnp.where(is_best, jnp.arange(overlaps.shape[1])[None, :],
                             -1).max(axis=1)
        argmax = jnp.where(claimed, claim_gt, argmax)
        pos = pos | claimed
        labels = jnp.where(pos, gt_labels[jnp.clip(argmax, 0)], num_classes)
        return AssignResult(
            assigned_gt_inds=jnp.where(pos, argmax, -1).astype(jnp.int32),
            max_overlaps=jnp.where(pos, max_ov, 0.0),
            labels=labels.astype(jnp.int32),
            pos_mask=pos)


@ASSIGNERS.register_module()
class RegionAssigner:
    """Cascade-RPN stage-1 assignment (region_assigner.py): each gt maps to
    one pyramid level by scale; anchors whose center falls in the
    center_ratio-shrunk gt region on that level are positive; the
    ignore_ratio band (on the level and its neighbours) is excluded from
    negatives. Smaller gts win overlaps.
    """

    def __init__(self, center_ratio=0.2, ignore_ratio=0.5, **kwargs):
        self.center_ratio = center_ratio
        self.ignore_ratio = ignore_ratio

    def assign(self, anchors, num_level_anchors, gt_bboxes, gt_labels,
               gt_valid, valid_mask=None, num_classes=1,
               anchor_scale=8, strides=(8, 16, 32, 64, 128)):
        n = anchors.shape[0]
        if valid_mask is None:
            valid_mask = jnp.ones((n, ), bool)
        level_id = jnp.asarray(np.concatenate([
            np.full(c, i, np.int32) for i, c in enumerate(num_level_anchors)
        ]))
        num_lvls = len(num_level_anchors)
        scale = jnp.sqrt(jnp.maximum(
            (gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
            (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 1e-6))
        min_size = anchor_scale * strides[0]
        tgt_lvl = jnp.clip(jnp.floor(jnp.log2(scale / min_size) + 0.5),
                           0, num_lvls - 1)
        cx = (anchors[:, 0] + anchors[:, 2]) / 2
        cy = (anchors[:, 1] + anchors[:, 3]) / 2

        def in_region(ratio):
            gx1, gy1, gx2, gy2 = (gt_bboxes[:, 0], gt_bboxes[:, 1],
                                  gt_bboxes[:, 2], gt_bboxes[:, 3])
            w = gx2 - gx1
            h = gy2 - gy1
            r = (1 - ratio) / 2
            return ((cx[:, None] >= (gx1 + r * w)[None]) &
                    (cx[:, None] <= (gx2 - r * w)[None]) &
                    (cy[:, None] >= (gy1 + r * h)[None]) &
                    (cy[:, None] <= (gy2 - r * h)[None]))

        on_lvl = level_id[:, None] == tgt_lvl[None, :].astype(jnp.int32)
        near = jnp.abs(level_id[:, None].astype(jnp.float32) -
                       tgt_lvl[None, :]) <= 1
        pos_in = in_region(self.center_ratio) & on_lvl & gt_valid[None, :] \
            & valid_mask[:, None]
        ign_in = in_region(self.ignore_ratio) & near & gt_valid[None, :]
        areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * \
            (gt_bboxes[:, 3] - gt_bboxes[:, 1])
        masked = jnp.where(pos_in, areas[None, :], INF)
        best = masked.argmin(axis=1)
        pos = masked.min(axis=1) < INF / 2
        ignore = ign_in.any(axis=1) & ~pos
        labels = jnp.where(pos, gt_labels[best], num_classes)
        return AssignResult(
            assigned_gt_inds=jnp.where(pos, best, -1).astype(jnp.int32),
            max_overlaps=jnp.where(pos, 1.0,
                                   jnp.where(ignore, -1.0, 0.0)),
            labels=labels.astype(jnp.int32),
            pos_mask=pos)
