"""Differential fuzz: ld_tpu's from-scratch COCO evaluator vs the vendored
pycocotools-port oracle (tests/coco_eval_oracle.py) on randomized det/gt
sets covering score ties, per-category crowds, empty images, >100-det
images, tiny/huge areas, and segmentation-area != box-area gts.

VERDICT r02 Missing #3 / Next #3: done = max |delta| < 1e-6 over 100
random cases on all 12 metrics. The reference's AP numbers are DEFINED by
pycocotools (/root/reference/mmdet/datasets/coco.py:363); this pins the
native protocol to it.
"""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import math

import numpy as np

from coco_eval_oracle import evaluate_oracle
from ld_tpu.evaluation.coco_eval import CocoEvaluator


class FakeDS:
    def __init__(self, anns, ncls):
        self.anns = anns
        self.CLASSES = tuple(f'c{i}' for i in range(ncls))

    def __len__(self):
        return len(self.anns)

    def get_ann_info(self, i):
        return self.anns[i]


def _rand_box(rs, lo=2.0, hi=300.0, canvas=640.0):
    w = math.exp(rs.uniform(math.log(lo), math.log(hi)))
    h = math.exp(rs.uniform(math.log(lo), math.log(hi)))
    x = rs.uniform(0, canvas - min(w, canvas - 1))
    y = rs.uniform(0, canvas - min(h, canvas - 1))
    return [x, y, x + w, y + h]


def _random_case(rs, ncls, big_dets=False):
    """Returns (oracle_images, fake_dataset_anns, det_results)."""
    images, anns, det_results = [], [], []
    for _ in range(rs.randint(1, 4)):
        gts, dts = [], []
        n_gt = rs.randint(0, 8)
        for _ in range(n_gt):
            box = _rand_box(rs)
            bw, bh = box[2] - box[0], box[3] - box[1]
            # segmentation area != box area about half the time
            area = bw * bh * (rs.uniform(0.4, 1.0)
                              if rs.rand() < 0.5 else 1.0)
            gts.append(dict(bbox=box, area=area,
                            iscrowd=int(rs.rand() < 0.15),
                            cat=int(rs.randint(ncls))))
        n_det = 120 if big_dets else rs.randint(0, 14)
        for _ in range(n_det):
            if gts and rs.rand() < 0.7:
                g = gts[rs.randint(len(gts))]
                jitter = rs.uniform(-0.3, 0.3, 4) * \
                    (g['bbox'][2] - g['bbox'][0])
                box = [g['bbox'][0] + jitter[0], g['bbox'][1] + jitter[1],
                       g['bbox'][2] + jitter[2], g['bbox'][3] + jitter[3]]
                if box[2] <= box[0] + 1:
                    box[2] = box[0] + 1
                if box[3] <= box[1] + 1:
                    box[3] = box[1] + 1
                cat = g['cat'] if rs.rand() < 0.8 else int(rs.randint(ncls))
            else:
                box = _rand_box(rs)
                cat = int(rs.randint(ncls))
            score = rs.rand()
            if rs.rand() < 0.4:       # score ties
                score = round(score, 1)
            dts.append(dict(bbox=box, score=float(score), cat=cat))
        images.append(dict(gts=gts, dts=dts))

        keep = [g for g in gts if not g['iscrowd']]
        crowd = [g for g in gts if g['iscrowd']]
        anns.append(dict(
            bboxes=np.array([g['bbox'] for g in keep],
                            np.float64).reshape(-1, 4),
            labels=np.array([g['cat'] for g in keep], np.int64),
            areas=np.array([g['area'] for g in keep], np.float64),
            bboxes_ignore=np.array([g['bbox'] for g in crowd],
                                   np.float64).reshape(-1, 4),
            labels_ignore=np.array([g['cat'] for g in crowd], np.int64),
            areas_ignore=np.array([g['area'] for g in crowd], np.float64)))
        det_results.append(dict(
            boxes=np.array([d['bbox'] + [d['score']] for d in dts],
                           np.float64).reshape(-1, 5),
            labels=np.array([d['cat'] for d in dts], np.int64)))
    return images, anns, det_results


def _compare_case(rs, ncls, big_dets=False):
    images, anns, det_results = _random_case(rs, ncls, big_dets)
    ours = CocoEvaluator(FakeDS(anns, ncls)).evaluate(det_results)
    ref = evaluate_oracle(images, ncls)
    worst = 0.0
    for key, r in ref.items():
        o = ours[key]
        if math.isnan(r):
            assert math.isnan(o), (key, o, r)
            continue
        worst = max(worst, abs(o - r))
        assert abs(o - r) < 1e-6, (key, o, r)
    return worst


def test_differential_100_random_cases():
    rs = np.random.RandomState(0)
    worst = 0.0
    for case in range(100):
        worst = max(worst, _compare_case(rs, ncls=int(rs.randint(1, 4))))
    assert worst < 1e-6, worst


def test_differential_over_100_dets():
    """maxDets slicing: >100 detections per image; pycocotools matches with
    maxDets[-1]=100 then slices — ld_tpu truncates before matching, which
    must be equivalent (greedy matching is prefix-stable)."""
    rs = np.random.RandomState(1)
    for case in range(5):
        _compare_case(rs, ncls=2, big_dets=True)


def test_differential_empty_images():
    """Images with no gts, no dets, or crowds only."""
    ncls = 2
    images = [
        dict(gts=[], dts=[]),
        dict(gts=[dict(bbox=[10, 10, 50, 50], area=1600.0, iscrowd=1,
                       cat=0)],
             dts=[dict(bbox=[12, 12, 52, 52], score=0.9, cat=0)]),
        dict(gts=[dict(bbox=[100, 100, 200, 220], area=12000.0, iscrowd=0,
                       cat=1)],
             dts=[]),
    ]
    anns, det_results = [], []
    for img in images:
        keep = [g for g in img['gts'] if not g['iscrowd']]
        crowd = [g for g in img['gts'] if g['iscrowd']]
        anns.append(dict(
            bboxes=np.array([g['bbox'] for g in keep],
                            np.float64).reshape(-1, 4),
            labels=np.array([g['cat'] for g in keep], np.int64),
            areas=np.array([g['area'] for g in keep], np.float64),
            bboxes_ignore=np.array([g['bbox'] for g in crowd],
                                   np.float64).reshape(-1, 4),
            labels_ignore=np.array([g['cat'] for g in crowd], np.int64),
            areas_ignore=np.array([g['area'] for g in crowd], np.float64)))
        det_results.append(dict(
            boxes=np.array([d['bbox'] + [d['score']] for d in img['dts']],
                           np.float64).reshape(-1, 5),
            labels=np.array([d['cat'] for d in img['dts']], np.int64)))
    ours = CocoEvaluator(FakeDS(anns, ncls)).evaluate(det_results)
    ref = evaluate_oracle(images, ncls)
    for key, r in ref.items():
        o = ours[key]
        assert (math.isnan(r) and math.isnan(o)) or abs(o - r) < 1e-6, \
            (key, o, r)
