"""TPU-native NMS kernels (padded, mask-based, static shapes).

Replaces the CUDA `mmcv.ops.nms` / `batched_nms` usage sites
(/root/reference/mmdet/core/post_processing/bbox_nms.py:2,70 and
torchvision NMS at /root/reference/mmdet/models/dense_heads/ld_head.py:637).

TPU-first design: greedy NMS is sequential, but its fixpoint can be reached
by *iterated matrix suppression* (Cluster-NMS, Zheng et al. 2020 — the same
algorithm the reference fork ships as its `voting_cluster_diounms` option at
bbox_nms.py:35): sort by score, build the upper-triangular IoU>thr matrix
once, then iterate `keep <- no kept earlier box suppresses me` until stable.
Each iteration is one (K,K)x(K,) contraction on the MXU; convergence takes
the length of the longest suppression chain (typically < 10 iterations),
and the result is EXACTLY greedy NMS.

All outputs are fixed-size with validity masks — jit/vmap/pjit safe.

Serving knobs (see docs/PERF.md "batch-scaling investigation"):
  * env `LD_TPU_NO_PALLAS_NMS=1` — force the XLA fallback instead of the
    VMEM Pallas kernel (read at trace time; an A/B isolation knob);
  * `nms_cfg['approx_topk']` — `jax.lax.approx_max_k` for the flat
    candidate top-k (non-default: trades exact mmdet parity for ~7%).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


def _use_pallas(k: int, overlap_mode: str) -> bool:
    """Route to the VMEM-resident Pallas kernel on TPU backends.

    LD_TPU_NO_PALLAS_NMS=1 forces the XLA fallback — an A/B knob for
    isolating the NMS kernel's share of serving time (docs/PERF.md
    batch-scaling investigation)."""
    if os.environ.get('LD_TPU_NO_PALLAS_NMS'):
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:  # pragma: no cover
        return False
    return (backend in ('tpu', 'axon') and overlap_mode == 'iou'
            and k % 8 == 0 and k <= 2048)


def topk_flat(scores: jnp.ndarray, k: int, groups: int = 8):
    """Exact top-k over a long 1-D score array, TPU-fast.

    `jax.lax.top_k` over N≈400k elements lowers to one long partial sort;
    splitting into `groups` lanes and running ONE BATCHED top-k per lane
    (then merging the G*k survivors) is exact — every global top-k element
    is in its own lane's top-k — and much faster: the sort length drops
    N -> N/G and the lanes run data-parallel on the VPU.

    Returns (values, indices) into the original array, like lax.top_k.
    """
    n = scores.shape[0]
    if n <= max(2 * k, 4096) or groups <= 1:
        return jax.lax.top_k(scores, k)
    g = -(-n // groups)                              # ceil division
    pad = g * groups - n
    padded = jnp.pad(scores, (0, pad), constant_values=-jnp.inf)
    lanes = padded.reshape(groups, g)
    lane_vals, lane_idx = jax.lax.top_k(lanes, min(k, g))   # batched
    base = (jnp.arange(groups, dtype=lane_idx.dtype) * g)[:, None]
    flat_vals = lane_vals.reshape(-1)
    flat_idx = (lane_idx + base).reshape(-1)
    top_vals, pos = jax.lax.top_k(flat_vals, k)
    return top_vals, flat_idx[pos]


def _cluster_nms_keep(boxes: jnp.ndarray, scores: jnp.ndarray,
                      iou_threshold: float, overlap_mode: str = 'iou',
                      valid=None) -> jnp.ndarray:
    """Keep-mask of greedy NMS over score-sorted boxes.

    Args:
        boxes: (K, 4) sorted by descending score.
        scores: (K,) descending.
        valid: (K,) optional bool — padded entries never kept.
    Returns:
        (K,) bool keep mask (still in sorted order).
    """
    k = boxes.shape[0]
    if _use_pallas(k, overlap_mode):
        from .pallas_nms import pallas_nms_keep
        v = jnp.ones((k, ), bool) if valid is None else valid
        return pallas_nms_keep(boxes, v, iou_threshold)
    iou = bbox_overlaps(boxes, boxes, mode=overlap_mode)
    tri = jnp.triu(jnp.ones((k, k), bool), k=1)
    suppress = (iou > iou_threshold) & tri          # i suppresses j (i<j)
    suppress_f = suppress.astype(jnp.float32)

    if valid is None:
        valid = jnp.ones((k, ), bool)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        # box j killed if any *kept* earlier box suppresses it
        killed = (keep.astype(jnp.float32) @ suppress_f) > 0.5
        new_keep = valid & ~killed
        return new_keep, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros((k, ), bool), jnp.asarray(0)))
    return keep


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_out: int, score_threshold: float = float('-inf'),
        overlap_mode: str = 'iou') -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning indices of kept boxes.

    Returns (static shapes; K = min(max_out, num_boxes)):
        idx: (K,) int32 indices into the input (undefined where invalid).
        valid: (K,) bool.
    """
    n = boxes.shape[0]
    order_scores, order = jax.lax.top_k(scores, n)
    sboxes = boxes[order]
    valid = order_scores > score_threshold
    keep = _cluster_nms_keep(sboxes, order_scores, iou_threshold,
                             overlap_mode, valid)
    # first `max_out` kept boxes, in score order
    kept_scores = jnp.where(keep, order_scores, -jnp.inf)
    top_scores, pos = jax.lax.top_k(kept_scores, min(max_out, n))
    return order[pos], top_scores > -jnp.inf


def soft_nms_select(boxes: jnp.ndarray, scores: jnp.ndarray, valid,
                    iou_threshold: float, max_out: int,
                    method: str = 'linear', sigma: float = 0.5,
                    min_score: float = 1e-3):
    """Greedy soft-NMS (Bodla et al. 2017; mmcv.ops.soft_nms semantics as
    consumed at /root/reference/mmdet/core/post_processing/bbox_nms.py:59
    via nms_cfg type='soft_nms').

    Soft-NMS is inherently sequential (every emission rescales the field),
    so it runs as a `max_out`-step scan: each step emits the current
    highest-scoring box and decays the rest by overlap with it —
    linear: *(1-iou) where iou > threshold; gaussian: *exp(-iou^2/sigma).
    One (N,) IoU row per step keeps the scan cheap at candidate counts
    after the usual top-k prefilter.

    Returns:
        idx: (max_out,) int32 indices in emission (descending decayed
            score) order.
        out_scores: (max_out,) decayed scores (0 where below min_score).
        out_valid: (max_out,) bool.
    """
    s0 = jnp.where(valid, scores, -jnp.inf)

    def body(s, _):
        i = jnp.argmax(s)
        si = s[i]
        iou = bbox_overlaps(boxes[i][None], boxes)[0]
        if method == 'gaussian':
            decay = jnp.exp(-(iou * iou) / sigma)
        else:
            decay = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
        s = jnp.where(jnp.isfinite(s), s * decay, s)
        s = s.at[i].set(-jnp.inf)
        return s, (i, si)

    _, (idx, out_scores) = jax.lax.scan(body, s0, None, length=max_out)
    out_valid = out_scores > min_score
    return (idx.astype(jnp.int32),
            jnp.where(out_valid, out_scores, 0.0), out_valid)


def _cluster_nms_keep_classed(boxes, class_idx, iou_threshold, valid,
                              iou_dtype):
    """Class-aware keep-mask with the IoU matrix in a reduced dtype.

    The class-offset trick is numerically incompatible with bf16 (offsets
    reach class_id*4096 ~ 3e5 where bf16 ulp is ~2048, destroying the box
    geometry), so this variant computes IoU on the RAW boxes in `iou_dtype`
    and gates suppression with an exact same-class mask instead — the same
    fixpoint, with the (K, K) overlap intermediates at half the HBM
    traffic. Boxes are pre-scaled by 1/32 (exact, power of two) so f16
    areas cannot overflow its 65504 max. Exactness is NOT guaranteed:
    measured det-set agreement vs fp32 on clustered COCO-scale candidates
    is 0.980 for float16 (10 mantissa bits, ~1 px ulp) and 0.881 for
    bfloat16 (8 bits, ~4 px) — use float16 if reducing at all; fp32 stays
    the default (docs/PERF.md).
    """
    k = boxes.shape[0]
    # IoU is scale-invariant; dividing by a power of two is exact in binary
    # FP and keeps f16 areas below its 65504 max (COCO boxes reach
    # 300x300=9e4 px^2 raw). Precision-neutral for bf16.
    small = (boxes * (1.0 / 32.0)).astype(iou_dtype)
    iou = bbox_overlaps(small, small)
    tri = jnp.triu(jnp.ones((k, k), bool), k=1)
    same = class_idx[:, None] == class_idx[None, :]
    suppress_f = ((iou > iou_threshold) & tri & same).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        killed = (keep.astype(jnp.float32) @ suppress_f) > 0.5
        return valid & ~killed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros((k, ), bool), jnp.asarray(0)))
    return keep


def _topk_pairs(masked: jnp.ndarray, k: int,
                exact_preprune: bool = None):
    """Top-k (anchor, class) pairs of a thresholded (N, C) score matrix;
    returns (values, flat indices) exactly like lax.top_k on the flat
    array (on untied scores).

    EXACT anchor pre-prune for the N*C flat top-k — the dominant serving
    post-processing cost (3.33 of 3.53 ms/batch-8, docs/PERF.md
    batch-scaling probe). Every pair in the global top-k belongs to an
    anchor whose per-anchor class max is itself among the top-k anchor
    maxes: if anchor a is outside that set, >= k anchors each contribute
    a pair (their max) strictly above every pair of a, so no pair of a
    can rank top-k. The flat stage then reads k*C values instead of N*C
    (400k -> 82k at GFL serving shapes; measured 3.53 -> 1.04 ms/batch-8,
    e2e 227 -> 241 img/s). Selected anchors are re-sorted ascending so
    intra-set tie-breaking follows original flat order (exactness
    standard of tests/test_nms.py::test_topk_flat_exact_vs_lax: exact on
    untied scores; boundary ties may swap equal-scored pairs, same
    caveat as topk_flat's lane grouping)."""
    num_anchors, num_classes = masked.shape
    if (exact_preprune if exact_preprune is not None
            else (num_anchors > 2 * k and num_classes > 1)):
        n_anch = min(k, num_anchors)
        _, anch = topk_flat(masked.max(axis=1), n_anch)
        anch = jnp.sort(anch)
        top_scores, sub_idx = topk_flat(masked[anch].reshape(-1), k)
        return top_scores, (anch[sub_idx // num_classes] * num_classes
                            + sub_idx % num_classes)
    return topk_flat(masked.reshape(-1), k)


def multiclass_nms(mlvl_bboxes: jnp.ndarray,
                   mlvl_scores: jnp.ndarray,
                   score_thr: float,
                   iou_threshold: float,
                   max_per_img: int = 100,
                   max_candidates: int = 1024,
                   box_coord_bound: float = 4096.0,
                   nms_cfg: dict = None,
                   iou_dtype=None,
                   approx_topk=None,
                   exact_preprune: bool = None):
    """Class-aware NMS over one image's multi-level candidates.

    Parity with /root/reference/mmdet/core/post_processing/bbox_nms.py:70:
    per-(anchor, class) pairs above `score_thr` compete in a single NMS where
    boxes of different classes never suppress each other (class-offset trick),
    then the top `max_per_img` survivors are returned.

    TPU-first: instead of dynamic filtering, the top `max_candidates` pairs
    by score are selected (static shape) — with the usual score_thr=0.05 this
    retains every pair the reference would keep.

    Args:
        mlvl_bboxes: (N, 4).
        mlvl_scores: (N, C) sigmoid class scores WITHOUT background column.
    Returns:
        dets: (max_per_img, 5) [x1, y1, x2, y2, score], zero-padded.
        labels: (max_per_img,) int32.
        valid: (max_per_img,) bool.
    """
    num_anchors, num_classes = mlvl_scores.shape
    if approx_topk is None:
        # every head routes test_cfg.nms here as nms_cfg, so the knob works
        # framework-wide, not just for the callers that plumb the kwarg
        # (advisor r4: GFLHead was the only head passing it explicitly)
        approx_topk = (nms_cfg or {}).get('approx_topk')
    masked = jnp.where(mlvl_scores > score_thr, mlvl_scores, 0.0)
    k = min(max_candidates, masked.size)
    if approx_topk:
        # approx_max_k uses the TPU-optimized partial-reduce lowering;
        # recall_target<1 may drop true top-k candidates — knob
        # `test_cfg.nms.approx_topk=<recall>`, default off (exact parity)
        top_scores, top_idx = jax.lax.approx_max_k(
            masked.reshape(-1), k, recall_target=float(approx_topk))
    else:
        top_scores, top_idx = _topk_pairs(masked, k, exact_preprune)
    anchor_idx = top_idx // num_classes
    class_idx = (top_idx % num_classes).astype(jnp.int32)
    cand_boxes = mlvl_bboxes[anchor_idx]
    cand_valid = top_scores > 0.0

    # class-offset trick; the offset must exceed every coordinate (the
    # reference derives it from boxes.max()), else giant boxes bleed into
    # the next class's band
    bound = jnp.maximum(jnp.asarray(box_coord_bound, cand_boxes.dtype),
                        cand_boxes.max() + 1.0)
    offset_boxes = cand_boxes + (class_idx.astype(cand_boxes.dtype) *
                                 bound)[:, None]
    if (nms_cfg or {}).get('type') == 'soft_nms':
        m = min(max_per_img, k)
        idx, s, v = soft_nms_select(
            offset_boxes, top_scores, cand_valid,
            nms_cfg.get('iou_threshold', 0.3), m,
            method=nms_cfg.get('method', 'linear'),
            sigma=nms_cfg.get('sigma', 0.5),
            min_score=nms_cfg.get('min_score', 1e-3))
        out_boxes = jnp.where(v[:, None], cand_boxes[idx], 0.0)
        out_labels = jnp.where(v, class_idx[idx], -1)
        pad = max_per_img - m
        s, v = jnp.where(v, s, 0.0), v
        if pad:
            s = jnp.pad(s, (0, pad))
            out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
            out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
            v = jnp.pad(v, (0, pad))
        return (jnp.concatenate([out_boxes, s[:, None]], -1),
                out_labels, v)
    if iou_dtype is not None and jnp.dtype(iou_dtype) != jnp.float32:
        keep = _cluster_nms_keep_classed(cand_boxes, class_idx,
                                         iou_threshold, cand_valid,
                                         iou_dtype)
    else:
        keep = _cluster_nms_keep(offset_boxes, top_scores, iou_threshold,
                                 valid=cand_valid)

    return _finalize(keep, top_scores, cand_boxes, class_idx, max_per_img)


def _finalize(keep, top_scores, boxes, class_idx, max_per_img):
    """Top `max_per_img` surviving candidates, zero-padded to a fixed size."""
    kept_scores = jnp.where(keep, top_scores, -jnp.inf)
    m = min(max_per_img, kept_scores.shape[0])
    out_scores, pos = jax.lax.top_k(kept_scores, m)
    out_valid = out_scores > 0.0
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    out_boxes = jnp.where(out_valid[:, None], boxes[pos], 0.0)
    out_labels = jnp.where(out_valid, class_idx[pos], -1)
    pad = max_per_img - m
    if pad:
        out_scores = jnp.pad(out_scores, (0, pad))
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
        out_valid = jnp.pad(out_valid, (0, pad))
    dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=-1)
    return dets, out_labels, out_valid


def multiclass_nms_voting(mlvl_bboxes, mlvl_scores, score_thr, iou_threshold,
                          max_per_img=100, max_candidates=1024,
                          beta=0.8, sigma=0.025,
                          box_coord_bound=4096.0):
    """Cluster-DIoU NMS with Gaussian score voting.

    Parity target: the fork's custom `voting_cluster_diounms` branch
    (/root/reference/mmdet/core/post_processing/bbox_nms.py:35-69,148-180):
    suppression uses DIoU scaled by beta, and each surviving box is refined
    as a score*exp(-(1-IoU)^2/sigma)-weighted average of same-class boxes.
    """
    num_anchors, num_classes = mlvl_scores.shape
    masked = jnp.where(mlvl_scores > score_thr, mlvl_scores, 0.0)
    k = min(max_candidates, masked.size)
    top_scores, top_idx = _topk_pairs(masked, k)
    anchor_idx = top_idx // num_classes
    class_idx = (top_idx % num_classes).astype(jnp.int32)
    cand_boxes = mlvl_bboxes[anchor_idx]
    cand_valid = top_scores > 0.0

    offset_boxes = cand_boxes + (class_idx.astype(cand_boxes.dtype) *
                                 box_coord_bound)[:, None]
    # reference diou(): IoU - D**beta with D = center distance^2 over the
    # enclosing box diagonal^2 (bbox_nms.py diou(), beta=0.8); computed on
    # class-offset boxes so cross-class pairs never interact
    iou = bbox_overlaps(offset_boxes, offset_boxes)
    cx = (offset_boxes[:, 0] + offset_boxes[:, 2]) / 2
    cy = (offset_boxes[:, 1] + offset_boxes[:, 3]) / 2
    enc_l = jnp.minimum(offset_boxes[:, None, 0], offset_boxes[None, :, 0])
    enc_t = jnp.minimum(offset_boxes[:, None, 1], offset_boxes[None, :, 1])
    enc_r = jnp.maximum(offset_boxes[:, None, 2], offset_boxes[None, :, 2])
    enc_b = jnp.maximum(offset_boxes[:, None, 3], offset_boxes[None, :, 3])
    d2 = ((cx[None, :] - cx[:, None])**2 + (cy[None, :] - cy[:, None])**2)
    c2 = (enc_r - enc_l)**2 + (enc_b - enc_t)**2 + 1e-7
    dist = jnp.clip(d2 / c2, 0.0, 1.0)
    diou = iou - dist**beta

    kk = offset_boxes.shape[0]
    tri = jnp.triu(jnp.ones((kk, kk), bool), k=1)
    suppress = ((diou > iou_threshold) & tri).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < kk, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        killed = (keep.astype(jnp.float32) @ suppress) > 0.5
        return cand_valid & ~killed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (cand_valid, jnp.zeros((kk, ), bool), jnp.asarray(0)))

    # Gaussian score voting: box i is refined by every LOWER-scored
    # candidate j >= i (triu incl. diagonal) whose cluster-DIoU > 0.7,
    # weighted exp(-(1-diou)^2/sigma) * score_j (bbox_nms.py:168-170;
    # suppressed candidates still vote — only rows are keep-masked there)
    triu_inc = jnp.triu(jnp.ones((kk, kk), bool))
    gate = triu_inc & (diou > 0.7) & cand_valid[None, :]
    w = jnp.where(gate, jnp.exp(-(1.0 - diou)**2 / sigma) *
                  top_scores[None, :], 0.0)
    voted = (w @ cand_boxes) / jnp.maximum(w.sum(-1, keepdims=True), 1e-6)

    return _finalize(keep, top_scores, voted, class_idx, max_per_img)


def fast_nms(boxes, scores, labels, iou_threshold=0.5, max_out=100,
             valid=None):
    """YOLACT Fast NMS: single-pass matrix suppression (a box is dropped if
    ANY higher-scored same-class box overlaps it, kept or not).

    Parity: /root/reference/mmdet/core/post_processing/bbox_nms.py:195.
    Slightly over-suppresses vs greedy NMS but is one matmul-free pass.
    """
    n = boxes.shape[0]
    order_scores, order = jax.lax.top_k(scores, n)
    sboxes = boxes[order]
    slabels = labels[order]
    v = jnp.ones((n, ), bool) if valid is None else valid[order]
    iou = bbox_overlaps(sboxes, sboxes)
    tri = jnp.triu(jnp.ones((n, n), bool), k=1)
    same = slabels[:, None] == slabels[None, :]
    suppressed = ((iou > iou_threshold) & tri & same).any(axis=0)
    keep = v & ~suppressed
    kept_scores = jnp.where(keep, order_scores, -jnp.inf)
    top, pos = jax.lax.top_k(kept_scores, min(max_out, n))
    return order[pos], top > -jnp.inf


def batched_multiclass_nms(mlvl_bboxes, mlvl_scores, score_thr, iou_threshold,
                           max_per_img=100, max_candidates=1024):
    """vmap of `multiclass_nms` over a leading batch dim."""
    return jax.vmap(
        partial(multiclass_nms, score_thr=score_thr,
                iou_threshold=iou_threshold, max_per_img=max_per_img,
                max_candidates=max_candidates))(mlvl_bboxes, mlvl_scores)
