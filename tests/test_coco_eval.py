"""Native COCO evaluator tests against hand-computable cases."""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import numpy as np

from ld_tpu.evaluation.coco_eval import CocoEvaluator
from ld_tpu.evaluation.mean_ap import eval_map, average_precision


class _FakeDataset:
    CLASSES = ('a', 'b')

    def __init__(self, anns):
        self.anns = anns
        self.img_infos = [dict(id=i) for i in range(len(anns))]

    def __len__(self):
        return len(self.anns)

    def get_ann_info(self, i):
        return self.anns[i]


def _ann(boxes, labels):
    return dict(bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int64),
                bboxes_ignore=np.zeros((0, 4), np.float32))


def test_perfect_predictions_ap1():
    anns = [_ann([[10, 10, 50, 50], [60, 60, 90, 90]], [0, 1]),
            _ann([[0, 0, 30, 30]], [0])]
    ds = _FakeDataset(anns)
    dets = []
    for a in anns:
        boxes = np.concatenate([a['bboxes'],
                                np.full((len(a['bboxes']), 1), 0.9)], -1)
        dets.append(dict(boxes=boxes, labels=a['labels']))
    m = CocoEvaluator(ds).evaluate(dets)
    assert abs(m['bbox_mAP'] - 1.0) < 1e-6
    assert abs(m['bbox_mAP_50'] - 1.0) < 1e-6
    assert abs(m['AR@100'] - 1.0) < 1e-6


def test_no_predictions_ap0():
    anns = [_ann([[10, 10, 50, 50]], [0])]
    ds = _FakeDataset(anns)
    dets = [dict(boxes=np.zeros((0, 5)), labels=np.zeros((0, )))]
    m = CocoEvaluator(ds).evaluate(dets)
    assert m['bbox_mAP'] == 0.0


def test_half_iou_prediction():
    """A det with IoU ~0.5 counts at thr 0.5 but not at 0.75."""
    anns = [_ann([[0, 0, 100, 100]], [0])]
    ds = _FakeDataset(anns)
    # shifted box: IoU = (100-45)*100 / (2*100*100 - 55*100) = 0.379... use
    # a box overlapping 60%: [0,0,100,60] vs [0,0,100,100] -> IoU 0.6
    dets = [dict(boxes=np.asarray([[0, 0, 100, 60, 0.9]]),
                 labels=np.asarray([0]))]
    m = CocoEvaluator(ds).evaluate(dets)
    assert m['bbox_mAP_50'] > 0.99
    assert m['bbox_mAP_75'] == 0.0
    # mAP over 10 thresholds: matched at 0.5, 0.55, 0.6 -> 3/10
    assert abs(m['bbox_mAP'] - 0.3) < 0.02


def test_false_positive_lowers_precision():
    anns = [_ann([[0, 0, 100, 100]], [0])]
    ds = _FakeDataset(anns)
    dets = [dict(
        boxes=np.asarray([[0, 0, 100, 100, 0.8], [200, 200, 300, 300, 0.9]]),
        labels=np.asarray([0, 0]))]
    m = CocoEvaluator(ds).evaluate(dets)
    # FP ranked above TP: precision at recall 1.0 is 0.5
    assert abs(m['bbox_mAP_50'] - 0.5) < 0.02


def test_crowd_region_not_fp():
    ann = _ann([[0, 0, 50, 50]], [0])
    ann['bboxes_ignore'] = np.asarray([[100, 100, 200, 200]], np.float32)
    ds = _FakeDataset([ann])
    dets = [dict(
        boxes=np.asarray([[0, 0, 50, 50, 0.9], [100, 100, 200, 200, 0.8]]),
        labels=np.asarray([0, 0]))]
    m = CocoEvaluator(ds).evaluate(dets)
    # the det inside the crowd region is ignored, not a false positive
    assert abs(m['bbox_mAP_50'] - 1.0) < 1e-6


def test_area_ranges():
    anns = [_ann([[0, 0, 10, 10], [0, 0, 500, 500]], [0, 0])]  # small+large
    ds = _FakeDataset(anns)
    dets = [dict(boxes=np.asarray([[0, 0, 10, 10, 0.9],
                                   [0, 0, 500, 500, 0.8]]),
                 labels=np.asarray([0, 0]))]
    m = CocoEvaluator(ds).evaluate(dets)
    assert abs(m['bbox_mAP_s'] - 1.0) < 1e-6
    assert abs(m['bbox_mAP_l'] - 1.0) < 1e-6
    assert np.isnan(m['bbox_mAP_m'])  # no medium gts anywhere


def test_voc_eval_map():
    anns = [_ann([[0, 0, 100, 100]], [0]), _ann([[0, 0, 50, 50]], [1])]
    dets = [
        [np.asarray([[0, 0, 100, 100, 0.9]]), np.zeros((0, 5))],
        [np.zeros((0, 5)), np.asarray([[0, 0, 50, 50, 0.8]])],
    ]
    mAP, per_class = eval_map(dets, anns, iou_thr=0.5, num_classes=2)
    assert abs(mAP - 1.0) < 1e-6


def test_average_precision_modes():
    rec = np.asarray([0.1, 0.5, 1.0])
    prec = np.asarray([1.0, 0.6, 0.4])
    area = average_precision(rec, prec, 'area')
    p11 = average_precision(rec, prec, '11points')
    assert 0 < area <= 1 and 0 < p11 <= 1
