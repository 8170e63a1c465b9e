"""AP_landscape paired-eval tool integration test.

Builds TWO small detectors from temp config files and runs the lock-step
paired evaluation end-to-end (tools/analysis_tools/ap_landscape.py; parity
target /root/reference/AP_landscape/test.py:204-239), asserting per-level
feature/cls/bbox errors and the Pearson correlation come out present and
finite. Round-3 verdict: the only §1 layer never executed by CI.
"""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import json
import os
import sys

import numpy as np

_MODEL = """
model = dict(
    type='GFL',
    backbone=dict(type='ResNet', depth={depth}, frozen_stages=1,
                  norm_eval=True),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels={oc},
              start_level=1, add_extra_convs='on_output', num_outs=5),
    bbox_head=dict(type='GFLHead', num_classes=4, in_channels={oc},
                   stacked_convs=1, feat_channels={oc}, reg_max=8),
    test_cfg=dict(nms_pre=50, score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.6), max_per_img=10))
pad_to = (64, 96)
data = dict(
    samples_per_gpu=1,
    test=dict(type='SyntheticDetectionDataset', num_images=3, hw=(64, 96),
              pipeline=[
                  dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1],
                       to_rgb=False),
                  dict(type='Pad', size_divisor=32),
                  dict(type='Collect', keys=['img']),
              ]))
"""


def test_ap_landscape_tool(tmp_path, monkeypatch):
    teacher_cfg = tmp_path / 'teacher.py'
    student_cfg = tmp_path / 'student.py'
    # same channel width so FPN feature L1 is comparable level-by-level;
    # different depths (the reference pairs R101 teacher / R50 student) —
    # init_detector seeds identically, so same-architecture pairs would
    # have IDENTICAL params and zero error
    teacher_cfg.write_text(_MODEL.format(oc=32, depth=34))
    student_cfg.write_text(_MODEL.format(oc=32, depth=18))
    out = tmp_path / 'landscape.json'

    root = os.path.join(os.path.dirname(__file__), '..')
    sys.path.insert(0, os.path.join(root, 'tools', 'analysis_tools'))
    try:
        import ap_landscape
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(sys, 'argv', [
        'ap_landscape.py', str(teacher_cfg), str(student_cfg),
        '--max-images', '3', '--out', str(out)])
    ap_landscape.main()

    blob = json.loads(out.read_text())
    summary = blob['summary']
    # 5 FPN levels of per-level errors, all finite; pearson in [-1, 1]
    for key in ('feat_l1', 'cls_l1', 'bbox_l1'):
        arr = np.asarray(summary[key], np.float64)
        assert arr.shape == (5, ), (key, arr.shape)
        assert np.isfinite(arr).all(), (key, arr)
        # two differently-initialized models must actually differ (the
        # 64x96 test input leaves the last pyramid level degenerate 1x1 —
        # its sigmoid can quantize identically, so check levels 0-3)
        assert (arr[:4] > 0).all(), (key, arr)
    assert -1.0 <= float(summary['pearson']) <= 1.0
    assert len(blob['per_batch']['feat_l1']) == 3
