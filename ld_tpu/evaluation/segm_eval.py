"""Instance-segmentation (mask AP) evaluation.

Parity: the COCOeval 'segm' protocol (the reference delegates to
pycocotools; mmdet/datasets/coco.py:363 with metric='segm'). Same matching
machinery as bbox eval (greedy per image/category over 10 IoU thresholds)
with IoU computed between pasted binary masks instead of boxes. Masks are
evaluated at 1/`scale` resolution (default 1/4) — the standard accuracy/
memory trade (<0.3 mask-AP effect).

Detections come as roi-space sigmoid masks (R, 2s, 2s) + boxes; `paste_mask`
reproduces mmcv's paste (resize into the box, threshold 0.5).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .coco_eval import (AREA_RNG, IOU_THRS, MAX_DETS, REC_THRS)


def paste_mask(mask: np.ndarray, box: np.ndarray, out_h: int, out_w: int,
               thr: float = 0.5) -> np.ndarray:
    """Paste one roi-space mask into a (out_h, out_w) bitmap."""
    x1, y1, x2, y2 = box[:4]
    x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
    x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
    x1i, y1i = max(x1i, 0), max(y1i, 0)
    x2i, y2i = min(x2i, out_w), min(y2i, out_h)
    out = np.zeros((out_h, out_w), bool)
    if x2i <= x1i or y2i <= y1i:
        return out
    m = cv2.resize(mask.astype(np.float32), (x2i - x1i, y2i - y1i),
                   interpolation=cv2.INTER_LINEAR)
    out[y1i:y2i, x1i:x2i] = m >= thr
    return out


def rasterize_polygons(polys, h: int, w: int) -> np.ndarray:
    """pycocotools-exact polygon rasterization (coco_mask.poly_to_mask) —
    boundary-pixel semantics match what published mask-AP numbers were
    scored against (maskApi.c rleFrPoly), not cv2.fillPoly's."""
    from .coco_mask import poly_to_mask
    return poly_to_mask(polys, h, w)


def mask_iou(det_masks: np.ndarray, gt_masks: np.ndarray,
             iscrowd: np.ndarray) -> np.ndarray:
    """(D, G) IoU between boolean mask stacks; crowd columns use IoF."""
    d = det_masks.reshape(len(det_masks), -1).astype(np.float64)
    g = gt_masks.reshape(len(gt_masks), -1).astype(np.float64)
    inter = d @ g.T
    area_d = d.sum(1)[:, None]
    area_g = g.sum(1)[None, :]
    union = np.where(iscrowd[None, :], area_d, area_d + area_g - inter)
    return inter / np.maximum(union, 1e-10)


def _match_with_ious(ious, det_areas, gt_ignore, gt_crowd, area_rng,
                     max_det):
    """Greedy matching given a precomputed IoU matrix (dets score-sorted)."""
    T = len(IOU_THRS)
    D, G = ious.shape
    dtm = np.zeros((T, D), bool)
    dt_ig = np.zeros((T, D), bool)
    for ti, thr in enumerate(IOU_THRS):
        gt_matched = np.zeros(G, bool)
        for d in range(D):
            best_iou = min(thr, 1 - 1e-10)
            best_g = -1
            for g in range(G):
                if gt_matched[g] and not gt_crowd[g]:
                    continue
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
    out_of_rng = (det_areas < area_rng[0]) | (det_areas > area_rng[1])
    dt_ig = dt_ig | (~dtm & out_of_rng[None, :])
    return dtm, dt_ig


class SegmEvaluator:
    """Mask AP over a dataset with polygon gt annotations.

    det_results per image: dict(boxes (n, 5), labels (n,), masks (n, s, s)
    roi-space sigmoid masks). Boxes/masks in ORIGINAL image coordinates.
    """

    def __init__(self, dataset, scale: int = 4):
        self.dataset = dataset
        self.scale = scale
        self.num_classes = len(dataset.CLASSES)

    def _down(self, m, h, w):
        s = self.scale
        if s == 1:
            return m.astype(bool)
        return cv2.resize(m.astype(np.uint8),
                          (max(1, w // s), max(1, h // s)),
                          interpolation=cv2.INTER_NEAREST).astype(bool)

    def _gt_bitmaps(self, i, h, w):
        """Non-crowd masks (polygons), crowd masks (RLE segmentations from
        masks_ignore), and the annotation dict. GT areas come from the json
        'area' field when the dataset carries it (pycocotools filters GTs
        by SEGMENTATION area — cocoeval.py evaluateImg g['area']), with the
        full-res rasterized pixel count as the fallback."""
        from .coco_mask import decode_segmentation
        ann = self.dataset.get_ann_info(i)
        full = [rasterize_polygons(p, h, w) for p in ann.get('masks', [])]
        areas = ann.get('areas')
        if areas is None:
            areas = np.asarray([m.sum() for m in full], np.float64)
        gts = [self._down(m, h, w) for m in full]
        crowd_full = [decode_segmentation(s_, h, w)
                      for s_ in (ann.get('masks_ignore') or [])]
        crowd_areas = ann.get('areas_ignore')
        if crowd_areas is None or len(crowd_areas) != len(crowd_full):
            crowd_areas = np.asarray([m.sum() for m in crowd_full],
                                     np.float64)
        crowds = [self._down(m, h, w) for m in crowd_full]
        return gts, np.asarray(areas, np.float64), crowds, \
            np.asarray(crowd_areas, np.float64), ann

    def evaluate(self, det_results: List[Dict]) -> Dict[str, float]:
        num_imgs = len(det_results)
        T, R, K = len(IOU_THRS), len(REC_THRS), self.num_classes
        A, M = len(AREA_RNG), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        # pre-paste everything once per image
        per_img = []
        for i in range(num_imgs):
            info = self.dataset.img_infos[i]
            h, w = info['height'], info['width']
            s = self.scale
            sh, sw = max(1, h // s), max(1, w // s)
            gt_bitmaps, gt_areas, crowd_bitmaps, crowd_areas, ann = \
                self._gt_bitmaps(i, h, w)
            res = det_results[i]
            boxes = np.asarray(res['boxes'])
            labels = np.asarray(res['labels'])
            masks = res.get('masks')
            if isinstance(masks, (list, tuple)) and len(masks) and (
                    isinstance(masks[0], dict)
                    or np.asarray(masks[0]).shape == (h, w)):
                # RLE-direct / full-size-bitmap detections — the
                # reference's native segm result format (encode_mask_
                # results RLEs fed to COCOeval, mmdet coco.py:363); no
                # paste, just decode + downscale. Float full-size masks
                # binarize at 0.5 exactly like the paste path (a raw
                # astype would truncate probabilities to all-zero under
                # the uint8 downscale — r5 review finding).
                from .coco_mask import decode_segmentation

                def to_bitmap(m):
                    if isinstance(m, dict):
                        return decode_segmentation(m, h, w)
                    m = np.asarray(m)
                    return m >= 0.5 if m.dtype.kind == 'f' \
                        else m.astype(bool)

                det_bitmaps = [self._down(to_bitmap(m), h, w)
                               for m in masks]
            else:
                masks = np.asarray(
                    masks if masks is not None else np.zeros((0, 1, 1)))
                det_bitmaps = [
                    paste_mask(masks[d], boxes[d] / s, sh, sw)
                    for d in range(len(boxes))
                ]
            per_img.append((gt_bitmaps, gt_areas, crowd_bitmaps,
                            crowd_areas, ann, boxes, labels, det_bitmaps))

        area_items = list(AREA_RNG.items())
        s2 = float(self.scale)**2
        for k in range(K):
            for ai, (aname, arng) in enumerate(area_items):
                for mi, max_det in enumerate(MAX_DETS):
                    dtm_all, dtig_all, scores_all = [], [], []
                    npig = 0
                    for i in range(num_imgs):
                        (gt_bitmaps, gt_areas, crowd_bitmaps, crowd_areas,
                         ann, boxes, labels, det_bitmaps) = per_img[i]
                        gsel = [j for j, l in enumerate(ann['labels'])
                                if l == k]
                        ig_labels = ann.get('labels_ignore', [])
                        csel = [j for j, l in enumerate(ig_labels)
                                if l == k and j < len(crowd_bitmaps)]
                        dsel = [j for j in range(len(labels))
                                if labels[j] == k]
                        if not gsel and not csel and not dsel:
                            continue
                        order = np.argsort(
                            -boxes[dsel, 4],
                            kind='mergesort')[:max_det] if dsel else []
                        dsel = [dsel[o] for o in order]
                        dmask = np.stack([det_bitmaps[j] for j in dsel]) \
                            if dsel else np.zeros((0, 1, 1), bool)
                        if len(dmask):
                            shape = dmask.shape[1:]
                        elif gt_bitmaps:
                            shape = gt_bitmaps[0].shape
                        elif crowd_bitmaps:
                            shape = crowd_bitmaps[0].shape
                        else:
                            shape = (1, 1)
                        stack = [gt_bitmaps[j] for j in gsel] + \
                            [crowd_bitmaps[j] for j in csel]
                        gmask = np.stack(stack) if stack else \
                            np.zeros((0, ) + shape, bool)
                        # GT range filtering uses the ANNOTATION area (the
                        # json 'area' field, full-res px^2); crowds always
                        # ignore (cocoeval _prepare: iscrowd => ignore)
                        g_areas = np.concatenate([
                            gt_areas[gsel] if gsel else np.zeros(0),
                            crowd_areas[csel] if csel else np.zeros(0)])
                        crowd = np.zeros(len(gmask), bool)
                        crowd[len(gsel):] = True
                        gt_ignore = crowd | (g_areas < arng[0]) | \
                            (g_areas > arng[1])
                        g_order = np.argsort(gt_ignore, kind='mergesort')
                        gmask = gmask[g_order]
                        gt_ignore = gt_ignore[g_order]
                        crowd = crowd[g_order]
                        if len(dmask) and len(gmask):
                            ious = mask_iou(dmask, gmask, crowd)
                        else:
                            ious = np.zeros((len(dmask), len(gmask)))
                        # det range filter: pasted-mask pixel count, scaled
                        # back to full-res px^2 (maskUtils.area(dt))
                        d_areas = dmask.reshape(len(dmask), -1).sum(1) * s2 \
                            if len(dmask) else np.zeros(0)
                        dtm, dtig = _match_with_ious(
                            ious, d_areas, gt_ignore, crowd, arng, max_det)
                        dtm_all.append(dtm)
                        dtig_all.append(dtig)
                        scores_all.append(boxes[dsel, 4] if dsel else
                                          np.zeros(0))
                        npig += int((~gt_ignore).sum())
                    if npig == 0:
                        continue
                    dtm = np.concatenate(dtm_all, 1) if dtm_all else \
                        np.zeros((T, 0), bool)
                    dtig = np.concatenate(dtig_all, 1) if dtig_all else \
                        np.zeros((T, 0), bool)
                    scores = np.concatenate(scores_all) if scores_all else \
                        np.zeros(0)
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
                        q = np.zeros(R)
                        if len(pr):
                            for d in range(len(pr) - 1, 0, -1):
                                pr[d - 1] = max(pr[d - 1], pr[d])
                            inds = np.searchsorted(rc, REC_THRS, side='left')
                            valid = inds < len(pr)
                            q[valid] = pr[inds[valid]]
                        precision[ti, :, k, ai, mi] = q

        def summ(iou=None, area='all', max_det=100):
            ai = list(AREA_RNG).index(area)
            mi = MAX_DETS.index(max_det)
            s = precision[:, :, :, ai, mi]
            if iou is not None:
                s = s[[np.argmin(np.abs(IOU_THRS - iou))]]
            s = s[s > -1]
            return float(s.mean()) if s.size else float('nan')

        def summ_ar(area='all', max_det=100):
            ai = list(AREA_RNG).index(area)
            mi = MAX_DETS.index(max_det)
            s = recall[:, :, ai, mi]
            s = s[s > -1]
            return float(s.mean()) if s.size else float('nan')

        return {
            'segm_mAP': summ(),
            'segm_mAP_50': summ(iou=0.5),
            'segm_mAP_75': summ(iou=0.75),
            'segm_mAP_s': summ(area='small'),
            'segm_mAP_m': summ(area='medium'),
            'segm_mAP_l': summ(area='large'),
            'segm_AR@1': summ_ar(max_det=1),
            'segm_AR@10': summ_ar(max_det=10),
            'segm_AR@100': summ_ar(max_det=100),
            'segm_AR_s@100': summ_ar(area='small'),
            'segm_AR_m@100': summ_ar(area='medium'),
            'segm_AR_l@100': summ_ar(area='large'),
        }


# ---- RLE encoding (parity: pycocotools mask.encode / mmdet
# encode_mask_results) -------------------------------------------------------
def rle_encode(mask):
    """COCO compressed RLE of a binary mask (H, W) -> dict(size, counts).

    Column-major (Fortran) run lengths starting with a 0-run, compressed
    with the pycocotools LEB128-style byte scheme — byte-identical to
    pycocotools' `encode` so external tooling can consume the output.
    """
    import numpy as np
    m = np.asfortranarray(np.asarray(mask, dtype=np.uint8))
    h, w = m.shape
    flat = m.flatten(order='F')
    # run lengths, first run counts zeros
    diffs = np.nonzero(np.diff(flat))[0]
    bounds = np.concatenate([[0], diffs + 1, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat.size == 0:
        runs = []
    elif flat[0] == 1:
        runs = [0] + runs
    # pycocotools compression: difference-code runs from the 3rd entry on,
    # then variable-length base-32(ish) with 5 data bits + continuation
    out = bytearray()
    for i, run in enumerate(runs):
        x = int(run)
        if i > 2:
            x -= int(runs[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or
                        (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            out.append(c + 48)
    return dict(size=[h, w], counts=bytes(out))


def rle_decode(rle):
    """Inverse of `rle_encode` (accepts pycocotools-compatible dicts)."""
    import numpy as np
    h, w = rle['size']
    s = rle['counts']
    if isinstance(s, str):
        s = s.encode()
    runs = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(runs) > 2:
            x += runs[-2]
        runs.append(x)
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for run in runs:
        flat[pos:pos + run] = val
        pos += run
        val = 1 - val
    return flat.reshape((h, w), order='F')


def encode_mask_results(mask_results):
    """Per-class list of binary masks -> per-class list of RLEs
    (mmdet/core/mask/utils.py encode_mask_results)."""
    return [[rle_encode(m) for m in cls_masks] for cls_masks in mask_results]
