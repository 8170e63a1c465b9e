"""COCO detection evaluation (AP@[.5:.95]) implemented from scratch in numpy.

The reference delegates to pycocotools.COCOeval
(/root/reference/mmdet/datasets/coco.py:363); that package does not exist in
this image, so the full protocol is implemented natively and matches it:
10 IoU thresholds 0.50:0.05:0.95, 101-point interpolated precision, area
ranges all/small/medium/large, maxDets (1, 10, 100), crowd regions matched
as ignore with IoF overlap, greedy per-image matching in score order.

The per-(image, category) matcher is vectorized; the accumulation follows
COCOeval.accumulate exactly (monotone precision envelope + searchsorted at
the recall grid).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

def _native():
    try:
        from ld_tpu.native.build import load_cocomatch
        return load_cocomatch()
    except Exception:
        return None


IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    'all': (0.0, 1e10),
    'small': (0.0, 32.0**2),
    'medium': (32.0**2, 96.0**2),
    'large': (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _iou_xyxy(dets: np.ndarray, gts: np.ndarray,
              iscrowd: np.ndarray) -> np.ndarray:
    """(D, G) IoU; crowd gt columns use intersection / det-area (IoF)."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:4], gts[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = ((dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1]))[:, None]
    area_g = ((gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]))[None, :]
    union = np.where(iscrowd[None, :], area_d, area_d + area_g - inter)
    return inter / np.maximum(union, 1e-10)


def _match_single(det_boxes, det_scores, gt_boxes, gt_crowd, area_rng,
                  max_det, gt_areas=None):
    """Greedy matching for one (image, category, area-range).

    Returns (dtm, dt_ignore, scores, npig):
      dtm: (T, D) matched-gt flag per IoU threshold (1 matched-to-counted gt),
      dt_ignore: (T, D) detection ignored,
      npig: number of counted (non-ignored) gts.

    `gt_areas`: the annotation 'area' field when the dataset carries it —
    pycocotools filters gts by SEGMENTATION area, not box area
    (cocoeval.py evaluateImg: g['area'] from the json record); falls back
    to box area when absent (synthetic fixtures).

    Dispatches to the C++ kernel (ld_tpu/native/coco_match.cpp) when built;
    the numpy path below is the behavioural reference.
    """
    T = len(IOU_THRS)
    order = np.argsort(-det_scores, kind='mergesort')[:max_det]
    det_boxes = det_boxes[order]
    det_scores = det_scores[order]
    D = len(det_boxes)

    if gt_areas is None:
        gt_areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * \
            (gt_boxes[:, 3] - gt_boxes[:, 1]) if len(gt_boxes) else \
            np.zeros((0, ))
    gt_ignore = gt_crowd | (gt_areas < area_rng[0]) | \
        (gt_areas > area_rng[1])
    # counted gts first, ignored last (pycocotools sort by ignore flag)
    g_order = np.argsort(gt_ignore, kind='mergesort')
    gt_boxes = gt_boxes[g_order]
    gt_crowd = gt_crowd[g_order]
    gt_ignore = gt_ignore[g_order]
    G = len(gt_boxes)
    npig = int((~gt_ignore).sum())

    lib = _native()
    if lib is not None:
        import ctypes
        db = np.ascontiguousarray(det_boxes, np.float64)
        gb = np.ascontiguousarray(gt_boxes, np.float64)
        gc = np.ascontiguousarray(gt_crowd, np.uint8)
        gi = np.ascontiguousarray(gt_ignore, np.uint8)
        thrs = np.ascontiguousarray(IOU_THRS, np.float64)
        rng = np.ascontiguousarray(area_rng, np.float64)
        dtm8 = np.zeros((T, D), np.uint8)
        dtig8 = np.zeros((T, D), np.uint8)

        def ptr(a, ty):
            return a.ctypes.data_as(ctypes.POINTER(ty))

        lib.coco_match(ptr(db, ctypes.c_double), D,
                       ptr(gb, ctypes.c_double), ptr(gc, ctypes.c_uint8),
                       ptr(gi, ctypes.c_uint8), G,
                       ptr(thrs, ctypes.c_double), T,
                       ptr(rng, ctypes.c_double),
                       ptr(dtm8, ctypes.c_uint8), ptr(dtig8, ctypes.c_uint8))
        return dtm8.astype(bool), dtig8.astype(bool), det_scores, npig

    ious = _iou_xyxy(det_boxes, gt_boxes, gt_crowd)
    dtm = np.zeros((T, D), bool)
    dt_ig = np.zeros((T, D), bool)
    for ti, thr in enumerate(IOU_THRS):
        gt_matched = np.zeros(G, bool)
        for d in range(D):
            best_iou = min(thr, 1 - 1e-10)
            best_g = -1
            for g in range(G):
                # crowd gts may match many dets; others only once
                if gt_matched[g] and not gt_crowd[g]:
                    continue
                # gts are sorted counted-first: once we hold a counted match,
                # stop at the first ignored gt
                if best_g > -1 and not gt_ignore[best_g] and gt_ignore[g]:
                    break
                if ious[d, g] < best_iou:
                    continue
                best_iou = ious[d, g]
                best_g = g
            if best_g == -1:
                continue
            gt_matched[best_g] = True
            dtm[ti, d] = True
            dt_ig[ti, d] = gt_ignore[best_g]
    # unmatched dets outside the area range are ignored, not FPs
    d_area = (det_boxes[:, 2] - det_boxes[:, 0]) * \
        (det_boxes[:, 3] - det_boxes[:, 1])
    out_of_rng = (d_area < area_rng[0]) | (d_area > area_rng[1])
    dt_ig = dt_ig | (~dtm & out_of_rng[None, :])
    return dtm, dt_ig, det_scores, npig


class CocoEvaluator:
    """Accumulates detections and computes the 12 standard COCO metrics."""

    def __init__(self, dataset, iou_thrs=None):
        self.dataset = dataset
        self.num_classes = len(dataset.CLASSES) if hasattr(
            dataset, 'CLASSES') else 80

    def evaluate(self, det_results: List, classwise: bool = False
                 ) -> Dict[str, float]:
        """det_results: per image, dict(boxes=(n,5) xyxy+score, labels=(n,))
        or reference-style per-class list of (n,5) arrays."""
        num_imgs = len(det_results)
        assert num_imgs == len(self.dataset)

        # organize detections / gts by (img, class)
        per_img_cls_det = defaultdict(lambda: (np.zeros((0, 4)),
                                               np.zeros((0, ))))
        gts_by_img_cls = {}
        cls_present = set()
        for i in range(num_imgs):
            res = det_results[i]
            if isinstance(res, dict):
                boxes = np.asarray(res['boxes'], np.float64)
                labels = np.asarray(res['labels'])
                if 'valid' in res:
                    m = np.asarray(res['valid'], bool)
                    boxes, labels = boxes[m], labels[m]
            else:
                boxes = np.concatenate(res) if len(res) else np.zeros((0, 5))
                labels = np.concatenate([
                    np.full(len(r), c) for c, r in enumerate(res)
                ]) if len(res) else np.zeros((0, ))
            for c in np.unique(labels).astype(int):
                m = labels == c
                per_img_cls_det[(i, c)] = (boxes[m, :4], boxes[m, 4])
            ann = self.dataset.get_ann_info(i)
            ann_areas = ann.get('areas')
            for c in np.unique(ann['labels']).astype(int):
                m = ann['labels'] == c
                gts_by_img_cls[(i, c)] = (
                    ann['bboxes'][m].astype(np.float64),
                    np.asarray(ann_areas, np.float64)[m]
                    if ann_areas is not None else None)
                cls_present.add(c)
            ignore = ann.get('bboxes_ignore', np.zeros((0, 4)))
            if len(ignore):
                ig_labels = ann.get('labels_ignore')
                ig_areas = ann.get('areas_ignore')
                if ig_labels is not None:
                    # per-category crowd regions — the pycocotools protocol
                    # (crowd anns carry category_id and only ignore dets of
                    # that class, cocoeval.py _prepare/evaluateImg)
                    ig_labels = np.asarray(ig_labels)
                    for c in np.unique(ig_labels).astype(int):
                        m = ig_labels == c
                        gts_by_img_cls[(i, -1 - c)] = (
                            np.asarray(ignore, np.float64)[m],
                            np.asarray(ig_areas, np.float64)[m]
                            if ig_areas is not None else None)
                else:
                    # classless crowds (parsers that drop category_id):
                    # attach to all classes present — conservative fallback
                    gts_by_img_cls[(i, None)] = (
                        ignore.astype(np.float64), None)
            cls_present.update(np.unique(labels).astype(int).tolist())

        T, R, K = len(IOU_THRS), len(REC_THRS), self.num_classes
        A, M = len(AREA_RNG), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        area_items = list(AREA_RNG.items())
        for k in range(K):
            # gather per-image match results for this class
            for ai, (aname, arng) in enumerate(area_items):
                for mi, max_det in enumerate(MAX_DETS):
                    dtm_all, dtig_all, scores_all = [], [], []
                    npig = 0
                    for i in range(num_imgs):
                        gt, gt_areas = gts_by_img_cls.get(
                            (i, k), (np.zeros((0, 4)), None))
                        # per-class crowds under (i, -1-k); classless
                        # fallback under (i, None) applies to every class
                        crowd, crowd_areas = gts_by_img_cls.get(
                            (i, -1 - k),
                            gts_by_img_cls.get((i, None),
                                               (np.zeros((0, 4)), None)))
                        det_b, det_s = per_img_cls_det[(i, k)]
                        if len(gt) == 0 and len(det_b) == 0 and \
                                len(crowd) == 0:
                            continue
                        gtb = np.concatenate([gt, crowd]) if len(crowd) \
                            else gt
                        crowd_flag = np.concatenate([
                            np.zeros(len(gt), bool),
                            np.ones(len(crowd), bool)
                        ]) if len(crowd) else np.zeros(len(gt), bool)
                        if gt_areas is not None or crowd_areas is not None:
                            def _a(boxes, areas):
                                if areas is not None:
                                    return areas
                                return (boxes[:, 2] - boxes[:, 0]) * \
                                    (boxes[:, 3] - boxes[:, 1])
                            areas = np.concatenate(
                                [_a(gt, gt_areas), _a(crowd, crowd_areas)])
                        else:
                            areas = None
                        dtm, dtig, s, n = _match_single(
                            det_b, det_s, gtb, crowd_flag, arng, max_det,
                            gt_areas=areas)
                        dtm_all.append(dtm)
                        dtig_all.append(dtig)
                        scores_all.append(s)
                        npig += n
                    if npig == 0:
                        continue
                    dtm = np.concatenate(dtm_all, 1) if dtm_all else \
                        np.zeros((T, 0), bool)
                    dtig = np.concatenate(dtig_all, 1) if dtig_all else \
                        np.zeros((T, 0), bool)
                    scores = np.concatenate(scores_all) if scores_all else \
                        np.zeros((0, ))
                    order = np.argsort(-scores, kind='mergesort')
                    dtm, dtig = dtm[:, order], dtig[:, order]
                    tps = (dtm & ~dtig).astype(np.float64)
                    fps = (~dtm & ~dtig).astype(np.float64)
                    tp_sum = tps.cumsum(1)
                    fp_sum = fps.cumsum(1)
                    for ti in range(T):
                        tp, fp = tp_sum[ti], fp_sum[ti]
                        rc = tp / npig
                        pr = tp / np.maximum(tp + fp, 1e-10)
                        recall[ti, k, ai, mi] = rc[-1] if len(rc) else 0.0
                        # monotone envelope from the right
                        q = np.zeros(R)
                        if len(pr):
                            for d in range(len(pr) - 1, 0, -1):
                                pr[d - 1] = max(pr[d - 1], pr[d])
                            inds = np.searchsorted(rc, REC_THRS, side='left')
                            valid = inds < len(pr)
                            q[valid] = pr[inds[valid]]
                        precision[ti, :, k, ai, mi] = q

        def _summ(prec_or_rec, iou=None, area='all', max_det=100):
            ai = list(AREA_RNG).index(area)
            mi = MAX_DETS.index(max_det)
            if prec_or_rec == 'precision':
                s = precision[:, :, :, ai, mi]
                if iou is not None:
                    s = s[[np.argmin(np.abs(IOU_THRS - iou))]]
            else:
                s = recall[:, :, ai, mi]
                if iou is not None:
                    s = s[[np.argmin(np.abs(IOU_THRS - iou))]]
            s = s[s > -1]
            return float(s.mean()) if s.size else float('nan')

        metrics = {
            'bbox_mAP': _summ('precision'),
            'bbox_mAP_50': _summ('precision', iou=0.5),
            'bbox_mAP_75': _summ('precision', iou=0.75),
            'bbox_mAP_s': _summ('precision', area='small'),
            'bbox_mAP_m': _summ('precision', area='medium'),
            'bbox_mAP_l': _summ('precision', area='large'),
            'AR@1': _summ('recall', max_det=1),
            'AR@10': _summ('recall', max_det=10),
            'AR@100': _summ('recall', max_det=100),
            'AR_s@100': _summ('recall', area='small'),
            'AR_m@100': _summ('recall', area='medium'),
            'AR_l@100': _summ('recall', area='large'),
        }
        if classwise:
            per_class = {}
            names = getattr(self.dataset, 'CLASSES',
                            [str(i) for i in range(K)])
            ai, mi = 0, MAX_DETS.index(100)
            for k in range(K):
                s = precision[:, :, k, ai, mi]
                s = s[s > -1]
                if s.size:
                    per_class[names[k]] = float(s.mean())
            metrics['classwise'] = per_class
        return metrics
