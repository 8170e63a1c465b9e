"""Test-only differential oracle for the COCOeval SEGM protocol.

Literal pure-python port of pycocotools' cocoeval.py with maskUtils.iou
semantics (the package the reference delegates mask AP to,
/root/reference/mmdet/datasets/coco.py:363 metric='segm'; mask IoU/area
per pycocotools maskApi rleIou/rleArea, here computed on decoded boolean
masks, which is value-identical). Ported from the published algorithm —
NOT from ld_tpu/evaluation/segm_eval.py — so
tests/test_segm_eval_differential.py can fuzz one against the other.

Covers: RLE/bitmap mask IoU with per-category crowd (IoF) reuse, gt
range-filtering by the ANNOTATION 'area' field, det range-filtering by
mask pixel area (maskUtils.area), iscrowd => always-ignored gts, maxDets
slicing, 10 IoU thresholds x 101-point interpolation, AR.

Input schema (per image):
    gts: list of dict(mask=(h, w) bool, area=float, iscrowd=0/1, cat=int)
    dts: list of dict(mask=(h, w) bool, score=float, cat=int)
"""
import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = [(0.0, 1e10), (0.0, 32.0**2), (32.0**2, 96.0**2),
            (96.0**2, 1e10)]
MAX_DETS = (1, 10, 100)


def _mask_iou(d_masks, g_masks, iscrowd):
    """maskUtils.iou on decoded masks: crowd gt -> inter/area(det)."""
    D, G = len(d_masks), len(g_masks)
    ious = np.zeros((D, G))
    for di in range(D):
        dm = d_masks[di]
        da = float(dm.sum())
        for gi in range(G):
            gm = g_masks[gi]
            inter = float(np.logical_and(dm, gm).sum())
            if iscrowd[gi]:
                union = da
            else:
                union = da + float(gm.sum()) - inter
            ious[di, gi] = inter / union if union > 0 else 0.0
    return ious


def _evaluate_img(gts, dts, arng, max_det):
    """cocoeval.py evaluateImg for one (img, cat, areaRng), segm flavor."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    g_ignore0 = np.array(
        [bool(g['iscrowd']) or g['area'] < arng[0] or g['area'] > arng[1]
         for g in gts])
    gtind = np.argsort(g_ignore0, kind='mergesort')
    gts = [gts[i] for i in gtind]
    dt_scores = np.array([d['score'] for d in dts])
    dtind = np.argsort(-dt_scores, kind='mergesort')[:max_det]
    dts = [dts[i] for i in dtind]

    iscrowd = [int(g['iscrowd']) for g in gts]
    ious = _mask_iou([d['mask'] for d in dts], [g['mask'] for g in gts],
                     iscrowd)

    T, G, D = len(IOU_THRS), len(gts), len(dts)
    gt_ig = np.array([bool(g['iscrowd']) or g['area'] < arng[0] or
                      g['area'] > arng[1] for g in gts])
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dt_ig = np.zeros((T, D))
    if len(ious):
        for tind, t in enumerate(IOU_THRS):
            for dind in range(D):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and not gt_ig[m] and gt_ig[gind]:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = 1 + m
                gtm[tind, m] = 1 + dind
    # det range filtering by MASK pixel area (loadRes: maskUtils.area)
    a = np.array([float(d['mask'].sum()) < arng[0] or
                  float(d['mask'].sum()) > arng[1] for d in dts]
                 ).reshape(1, -1)
    dt_ig = np.logical_or(dt_ig, np.logical_and(
        dtm == 0, np.repeat(a, T, 0)))
    return dict(dtMatches=dtm, dtIgnore=dt_ig,
                dtScores=np.array([d['score'] for d in dts]),
                gtIgnore=gt_ig)


def evaluate_oracle(images, num_classes):
    """COCOeval.evaluate+accumulate+summarize for segm; returns the
    12-metric dict with ld_tpu SegmEvaluator's keys."""
    T, R, K = len(IOU_THRS), len(REC_THRS), num_classes
    A, M = len(AREA_RNG), len(MAX_DETS)
    max_det_last = MAX_DETS[-1]

    evals = {}
    for i, img in enumerate(images):
        for k in range(K):
            gts = [g for g in img['gts'] if g['cat'] == k]
            dts = [d for d in img['dts'] if d['cat'] == k]
            for ai, arng in enumerate(AREA_RNG):
                evals[(i, k, ai)] = _evaluate_img(gts, dts, arng,
                                                  max_det_last)

    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k in range(K):
        for ai in range(A):
            for mi, max_det in enumerate(MAX_DETS):
                E = [evals[(i, k, ai)] for i in range(len(images))]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dt_scores = np.concatenate(
                    [e['dtScores'][0:max_det] for e in E])
                inds = np.argsort(-dt_scores, kind='mergesort')
                dtm = np.concatenate(
                    [e['dtMatches'][:, 0:max_det] for e in E], 1)[:, inds]
                dt_ig = np.concatenate(
                    [e['dtIgnore'][:, 0:max_det] for e in E], 1)[:, inds]
                gt_ig = np.concatenate([e['gtIgnore'] for e in E])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dtm),
                                     np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, 1).astype(np.float64)
                fp_sum = np.cumsum(fps, 1).astype(np.float64)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R, ))
                    recall[t, k, ai, mi] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    q = q.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    srt = np.searchsorted(rc, REC_THRS, side='left')
                    try:
                        for ri, pi in zip(range(len(srt)), srt):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[t, :, k, ai, mi] = np.array(q)

    def summ(use_prec, iou=None, ai=0, mi=2):
        if use_prec:
            s = precision[..., ai, mi]
            if iou is not None:
                s = s[[int(np.argmin(np.abs(IOU_THRS - iou)))]]
        else:
            s = recall[:, :, ai, mi]
        s = s[s > -1]
        return float(s.mean()) if s.size else float('nan')

    return {
        'segm_mAP': summ(True),
        'segm_mAP_50': summ(True, iou=0.5),
        'segm_mAP_75': summ(True, iou=0.75),
        'segm_mAP_s': summ(True, ai=1),
        'segm_mAP_m': summ(True, ai=2),
        'segm_mAP_l': summ(True, ai=3),
        'segm_AR@1': summ(False, mi=0),
        'segm_AR@10': summ(False, mi=1),
        'segm_AR@100': summ(False, mi=2),
        'segm_AR_s@100': summ(False, ai=1),
        'segm_AR_m@100': summ(False, ai=2),
        'segm_AR_l@100': summ(False, ai=3),
    }
