"""Differential fuzz: production VOC mAP (ld_tpu/evaluation/mean_ap.py)
vs the loop-port oracle of the reference protocol (tests/voc_map_oracle.py,
porting /root/reference/mmdet/core/evaluation/mean_ap.py).

This evaluator defines every VOC row in BASELINE.md (the LD paper loops
IoU thresholds over it for AP50:95 — README.md:172-184), so it gets the
same treatment the COCO evaluator got in round 3: randomized cases with
difficult/ignore boxes, double detections, empty classes and empty images,
pinned to the oracle on all outputs.
"""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import numpy as np
import pytest

from ld_tpu.evaluation import mean_ap as prod
from tests import voc_map_oracle as oracle


def _rand_boxes(rng, n, wh=200.0):
    xy = rng.uniform(0, wh * 0.7, (n, 2))
    sz = rng.uniform(4, wh * 0.4, (n, 2))
    return np.concatenate([xy, xy + sz], axis=1)


def _make_case(seed):
    """One randomized dataset: images x classes, dets correlated with GTs
    (jittered copies + duplicates + pure noise), difficult boxes, and the
    occasional class/image with nothing at all."""
    rng = np.random.RandomState(seed)
    num_imgs = rng.randint(1, 6)
    num_classes = rng.randint(1, 5)
    annotations, det_results = [], []
    for _ in range(num_imgs):
        n_gt = rng.randint(0, 8)
        n_ig = rng.randint(0, 4)
        bboxes = _rand_boxes(rng, n_gt)
        labels = rng.randint(0, num_classes, n_gt)
        ig_boxes = _rand_boxes(rng, n_ig)
        ig_labels = rng.randint(0, num_classes, n_ig)
        ann = dict(bboxes=bboxes.astype(np.float32), labels=labels,
                   bboxes_ignore=ig_boxes.astype(np.float32),
                   labels_ignore=ig_labels)
        if seed % 5 == 0:
            # reference semantics: no labels_ignore => class sees NO
            # ignore boxes at all (get_cls_results, mean_ap.py:240)
            ann.pop('labels_ignore')
        annotations.append(ann)

        per_class = []
        for c in range(num_classes):
            dets = []
            # jittered copies of this class's gts (tp candidates) plus
            # DUPLICATES (double-detection fp path) and ignore-box hits
            for src, lab_arr in ((bboxes, labels), (ig_boxes, ig_labels)):
                for b, lab in zip(src, lab_arr):
                    if lab != c:
                        continue
                    for _ in range(rng.randint(0, 3)):
                        jit = b + rng.uniform(-6, 6, 4)
                        dets.append(np.concatenate(
                            [jit, [rng.uniform(0.01, 1.0)]]))
            for _ in range(rng.randint(0, 4)):  # pure-noise fps
                dets.append(np.concatenate(
                    [_rand_boxes(rng, 1)[0], [rng.uniform(0.01, 1.0)]]))
            per_class.append(
                np.asarray(dets, np.float32).reshape(-1, 5))
        det_results.append(per_class)
    return det_results, annotations


@pytest.mark.parametrize('mode', ['area', '11points'])
def test_eval_map_matches_reference_oracle(mode):
    disagreements = []
    for seed in range(60):
        det_results, annotations = _make_case(seed)
        m_prod, res_prod = prod.eval_map(
            det_results, annotations, iou_thr=0.5, mode=mode)
        m_orc, res_orc = oracle.eval_map(
            det_results, annotations, iou_thr=0.5, mode=mode)
        if abs(m_prod - m_orc) > 1e-6:
            disagreements.append((seed, m_prod, m_orc))
        for rp, ro in zip(res_prod, res_orc):
            assert rp['num_gts'] == ro['num_gts'], seed
            assert rp['num_dets'] == ro['num_dets'], seed
            assert abs(rp['ap'] - ro['ap']) < 1e-6, (seed, rp['ap'],
                                                     ro['ap'])
    assert not disagreements, disagreements


@pytest.mark.parametrize('iou_thr', [0.5, 0.75, 0.95])
def test_eval_map_iou_threshold_sweep(iou_thr):
    """The AP50:95 protocol loops thresholds — pin a few of them."""
    for seed in (100, 101, 102, 103):
        det_results, annotations = _make_case(seed)
        m_prod, _ = prod.eval_map(det_results, annotations, iou_thr=iou_thr)
        m_orc, _ = oracle.eval_map(det_results, annotations, iou_thr=iou_thr)
        assert abs(m_prod - m_orc) < 1e-6, (seed, m_prod, m_orc)


def test_tpfp_reference_edge_semantics():
    """Hand cases for the three subtle rules the reference encodes."""
    # (1) det whose BEST overlap is an ignored gt is neither tp nor fp,
    # even though a real gt also clears the threshold
    det = np.array([[0., 0., 10., 10., 0.9]])
    gt = np.array([[0., 0., 10., 8.]])       # iou 0.8
    ig = np.array([[0., 0., 10., 9.5]])      # iou 0.95 (argmax)
    tp, fp = prod.tpfp_default(det, gt, ig, 0.5)
    assert tp.sum() == 0 and fp.sum() == 0

    # (2) double detection of one gt: second-best score is FP even when
    # an ignore box also overlaps it above threshold
    det = np.array([[0., 0., 10., 10., 0.9],
                    [0., 0., 10., 10.2, 0.8]])
    gt = np.array([[0., 0., 10., 10.]])
    ig = np.array([[0., 0., 10., 10.1]])
    # argmax of det0/det1 must be the REAL gt: make ignore iou smaller
    ig = np.array([[0., 0., 10., 14.]])
    tp, fp = prod.tpfp_default(det, gt, ig, 0.5)
    assert tp[0] == 1 and fp[0] == 0
    assert tp[1] == 0 and fp[1] == 1

    # (3) no gts at all: everything is FP
    tp, fp = prod.tpfp_default(det, np.zeros((0, 4)), np.zeros((0, 4)), 0.5)
    assert fp.all() and not tp.any()
