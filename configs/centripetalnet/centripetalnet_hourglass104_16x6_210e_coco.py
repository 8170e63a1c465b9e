# Parity: /root/reference/configs/centripetalnet/...
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='CentripetalNet',
    backbone=dict(type='HourglassNet', downsample_times=5, num_stacks=2),
    bbox_head=dict(type='CentripetalHead', num_classes=80, in_channels=256,
                   num_feat_levels=2),
    test_cfg=dict(corner_topk=100, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=100))
