"""ATSS assignment + VLR (valuable localization region) as static-shape ops.

Behavioural parity with /root/reference/mmdet/core/bbox/assigners/atss_assigner.py:33
(`assign`) and :183 (`get_vlr_region`), re-designed TPU-first:

  * GT boxes are padded to a fixed G with a validity mask — no per-image
    dynamic shapes anywhere.
  * The reference pre-filters anchors by `inside_flags` and runs per-level
    `topk` over the survivors. We instead give invalid anchors +INF centre
    distance so they sort behind every valid anchor, and mask candidate ranks
    `>= num_valid_in_level` out of the mean/std statistics — numerically
    identical to the reference's `min(topk, num_inside)` candidate sets.
  * All `nonzero()` gathers become dense (num_anchors, G) boolean masks;
    the anchor->gt dedup ("highest IoU wins") is a masked argmax.

Everything here is jit/vmap-safe; batch via `jax.vmap` over images.
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import ASSIGNERS
from .boxes import bbox_overlaps

INF = 1e8


class AssignResult(NamedTuple):
    """Static-shape assignment output for one image.

    assigned_gt_inds: (N,) int32 — 0-based gt index for positives, -1 else.
    max_overlaps: (N,) float — IoU with the assigned gt (0 for negatives).
    labels: (N,) int32 — class label for positives, `num_classes` else.
    pos_mask: (N,) bool.
    """
    assigned_gt_inds: jnp.ndarray
    max_overlaps: jnp.ndarray
    labels: jnp.ndarray
    pos_mask: jnp.ndarray


def _center_distances(anchors: jnp.ndarray, gt_bboxes: jnp.ndarray):
    gt_cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2.0
    gt_cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2.0
    a_cx = (anchors[:, 0] + anchors[:, 2]) / 2.0
    a_cy = (anchors[:, 1] + anchors[:, 3]) / 2.0
    return jnp.sqrt((a_cx[:, None] - gt_cx[None, :])**2 +
                    (a_cy[:, None] - gt_cy[None, :])**2)


def _small_topk_min(values: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k smallest entries along axis 1, ascending.

    TPU-first: `lax.top_k` lowers to a full sort (O(n log n) and slow on the
    VPU); for the tiny k=9 of ATSS, k iterated argmin+mask passes are an
    order of magnitude cheaper on long rows.
    """
    vals = values
    rows = jnp.arange(values.shape[0])
    idxs = []
    for _ in range(k):
        i = jnp.argmin(vals, axis=1)
        idxs.append(i)
        vals = vals.at[rows, i].set(jnp.inf)
    return jnp.stack(idxs, axis=1)


def _per_level_topk(distances: jnp.ndarray,
                    num_level_anchors: Sequence[int],
                    valid_mask: jnp.ndarray,
                    topk: int):
    """Per-level top-k anchors by centre distance, for every gt.

    Returns:
        cand_idx: (G, K_total) int32 global anchor indices (K_total static).
        cand_real: (G, K_total) bool — candidate rank < #valid anchors in its
            level AND rank < topk (emulates the reference's per-level
            `min(topk, num_inside)` candidate count).
    """
    num_gt = distances.shape[1]
    masked_dist = jnp.where(valid_mask[:, None], distances, INF)
    idx_parts: List[jnp.ndarray] = []
    real_parts: List[jnp.ndarray] = []
    start = 0
    for n_lvl in num_level_anchors:
        k = min(topk, n_lvl)
        d_lvl = masked_dist[start:start + n_lvl].T  # (G, n_lvl)
        if k <= 16:
            idx = _small_topk_min(d_lvl, k)         # (G, k) smallest
        else:
            _, idx = jax.lax.top_k(-d_lvl, k)
        n_valid = valid_mask[start:start + n_lvl].sum()
        rank = jnp.arange(k)
        real_parts.append(jnp.broadcast_to(rank < jnp.minimum(n_valid, k),
                                           (num_gt, k)))
        idx_parts.append(idx + start)
        start += n_lvl
    return jnp.concatenate(idx_parts, axis=1), jnp.concatenate(real_parts,
                                                               axis=1)


def _candidate_threshold(overlaps: jnp.ndarray, cand_idx: jnp.ndarray,
                         cand_real: jnp.ndarray):
    """mean + (Bessel-corrected) std of candidate IoUs, per gt."""
    cand_ov = jnp.take_along_axis(overlaps.T, cand_idx, axis=1)  # (G, K)
    m = cand_real.astype(cand_ov.dtype)
    n = jnp.maximum(m.sum(axis=1), 1.0)
    mean = (cand_ov * m).sum(axis=1) / n
    var = (((cand_ov - mean[:, None])**2) * m).sum(axis=1) / jnp.maximum(
        n - 1.0, 1.0)
    return mean + jnp.sqrt(var), cand_ov, m


@ASSIGNERS.register_module()
class ATSSAssigner:
    """Adaptive Training Sample Selection, dense static-shape formulation."""

    def __init__(self, topk: int = 9, iou_calculator=None, ignore_iof_thr=-1):
        self.topk = topk
        assert ignore_iof_thr == -1, (
            'ignore regions are not used by any GFL/LD config; '
            'pass ignore boxes as weight-0 gts instead')

    def assign(self,
               anchors: jnp.ndarray,
               num_level_anchors: Sequence[int],
               gt_bboxes: jnp.ndarray,
               gt_labels: jnp.ndarray,
               gt_valid: jnp.ndarray,
               valid_mask: jnp.ndarray = None,
               num_classes: int = 80) -> AssignResult:
        """Single-image ATSS assignment.

        Args:
            anchors: (N, 4) xyxy, all levels concatenated.
            num_level_anchors: static per-level anchor counts.
            gt_bboxes: (G, 4) padded gt boxes.
            gt_labels: (G,) padded labels.
            gt_valid: (G,) bool validity of padded gts.
            valid_mask: (N,) bool anchor validity (inside padded image).
        """
        num_anchors = anchors.shape[0]
        num_gt = gt_bboxes.shape[0]
        if valid_mask is None:
            valid_mask = jnp.ones((num_anchors, ), bool)

        overlaps = bbox_overlaps(anchors, gt_bboxes)          # (N, G)
        distances = _center_distances(anchors, gt_bboxes)     # (N, G)

        cand_idx, cand_real = _per_level_topk(distances, num_level_anchors,
                                              valid_mask, self.topk)
        thr, cand_ov, cand_m = _candidate_threshold(overlaps, cand_idx,
                                                    cand_real)

        # candidate positivity: IoU above threshold AND centre inside gt
        a_cx = (anchors[:, 0] + anchors[:, 2]) / 2.0
        a_cy = (anchors[:, 1] + anchors[:, 3]) / 2.0
        cand_cx = a_cx[cand_idx]                              # (G, K)
        cand_cy = a_cy[cand_idx]
        l_ = cand_cx - gt_bboxes[:, 0:1]
        t_ = cand_cy - gt_bboxes[:, 1:2]
        r_ = gt_bboxes[:, 2:3] - cand_cx
        b_ = gt_bboxes[:, 3:4] - cand_cy
        in_gt = jnp.minimum(jnp.minimum(l_, t_), jnp.minimum(r_, b_)) > 0.01
        is_pos = (cand_ov >= thr[:, None]) & in_gt & (cand_m > 0) \
            & gt_valid[:, None]

        # scatter candidate positivity back to the dense (N, G) grid
        pos_grid = jnp.zeros((num_anchors, num_gt), bool)
        gt_ids = jnp.broadcast_to(jnp.arange(num_gt)[:, None], cand_idx.shape)
        pos_grid = pos_grid.at[cand_idx.reshape(-1),
                               gt_ids.reshape(-1)].max(is_pos.reshape(-1))

        # anchors claimed by multiple gts keep the highest-IoU one
        ov_masked = jnp.where(pos_grid, overlaps, -INF)
        max_overlaps = ov_masked.max(axis=1)
        argmax = ov_masked.argmax(axis=1)
        assigned = max_overlaps > -INF / 2

        labels = jnp.where(assigned, gt_labels[argmax], num_classes)
        return AssignResult(
            assigned_gt_inds=jnp.where(assigned, argmax, -1).astype(jnp.int32),
            max_overlaps=jnp.where(assigned, max_overlaps, 0.0),
            labels=labels.astype(jnp.int32),
            pos_mask=assigned)

    def get_vlr_region(self,
                       anchors: jnp.ndarray,
                       num_level_anchors: Sequence[int],
                       gt_bboxes: jnp.ndarray,
                       gt_valid: jnp.ndarray,
                       valid_mask: jnp.ndarray = None) -> jnp.ndarray:
        """Valuable-localization-region weights, (N,) float.

        An anchor is VLR for gt g when `0.25*thr <= DIoU(a, g) < thr`
        (thr = top-9-by-distance IoU mean+std); its weight is the plain IoU
        with the best such gt. The reference enumerates ALL anchors as
        candidates here (selectable_k == level size), which collapses to a
        dense masked max — no topk needed at all.
        """
        num_anchors = anchors.shape[0]
        if valid_mask is None:
            valid_mask = jnp.ones((num_anchors, ), bool)

        overlaps = bbox_overlaps(anchors, gt_bboxes)
        diou = bbox_overlaps(anchors, gt_bboxes, mode='diou')
        distances = _center_distances(anchors, gt_bboxes)

        cand_idx, cand_real = _per_level_topk(distances, num_level_anchors,
                                              valid_mask, self.topk)
        thr, _, _ = _candidate_threshold(overlaps, cand_idx, cand_real)

        in_band = (diou < thr[None, :]) & (diou >= 0.25 * thr[None, :]) \
            & valid_mask[:, None] & gt_valid[None, :]
        ov_masked = jnp.where(in_band, overlaps, -INF)
        max_overlaps = ov_masked.max(axis=1)
        return jnp.where(max_overlaps > -INF / 2, max_overlaps, 0.0)
