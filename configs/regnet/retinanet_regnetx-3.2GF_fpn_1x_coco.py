# Parity: /root/reference/configs/regnet/retinanet_regnetx-3.2GF_fpn_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='RetinaNet',
    backbone=dict(type='RegNet', arch='regnetx_3.2gf', frozen_stages=1),
    neck=dict(type='FPN', in_channels=[96, 192, 432, 1008],
              out_channels=256, start_level=1,
              add_extra_convs='on_input', num_outs=5),
    bbox_head=dict(type='RetinaHead', num_classes=80, in_channels=256),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=100))
