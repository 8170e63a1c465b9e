"""Mask AP evaluator tests with hand-computable cases."""
import numpy as np

from ld_tpu.evaluation.segm_eval import SegmEvaluator, mask_iou, paste_mask


class _DS:
    CLASSES = ('a', 'b')

    def __init__(self):
        # one 200x200 image: a 40x40 square object of class 0
        self.img_infos = [dict(id=0, height=200, width=200)]
        poly = [[40, 40, 80, 40, 80, 80, 40, 80]]
        self.anns = [dict(
            bboxes=np.asarray([[40., 40., 80., 80.]], np.float32),
            labels=np.asarray([0]),
            bboxes_ignore=np.zeros((0, 4), np.float32),
            masks=[poly])]

    def __len__(self):
        return 1

    def get_ann_info(self, i):
        return self.anns[i]


def test_paste_mask_roundtrip():
    m = np.ones((28, 28), np.float32)
    out = paste_mask(m, np.asarray([10., 10., 20., 20.]), 50, 50)
    assert out[10:20, 10:20].all()
    assert out.sum() == 100


def test_mask_iou():
    a = np.zeros((1, 10, 10), bool); a[0, :5] = True
    b = np.zeros((1, 10, 10), bool); b[0, 2:7] = True
    iou = mask_iou(a, b, np.zeros(1, bool))
    np.testing.assert_allclose(iou[0, 0], 30 / 70, rtol=1e-6)


def test_perfect_mask_ap():
    ds = _DS()
    mask = np.ones((28, 28), np.float32)
    dets = [dict(boxes=np.asarray([[40., 40., 80., 80., 0.9]]),
                 labels=np.asarray([0]), masks=mask[None])]
    m = SegmEvaluator(ds).evaluate(dets)
    assert m['segm_mAP_50'] > 0.99
    assert m['segm_mAP'] > 0.6  # quantization at 1/4 scale costs high-IoU


def test_wrong_location_mask_ap_zero():
    ds = _DS()
    mask = np.ones((28, 28), np.float32)
    dets = [dict(boxes=np.asarray([[120., 120., 160., 160., 0.9]]),
                 labels=np.asarray([0]), masks=mask[None])]
    m = SegmEvaluator(ds).evaluate(dets)
    assert m['segm_mAP_50'] == 0.0
