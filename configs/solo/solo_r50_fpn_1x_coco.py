# SOLO v1 (reference dense_heads/solo_head.py)
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='SOLO',
    pretrained='torchvision://resnet50',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5),
    bbox_head=dict(type='SOLOHead', num_classes=80, in_channels=256,
                   feat_channels=256, stacked_convs=7,
                   num_grids=(40, 36, 24, 16, 12)),
    test_cfg=dict(score_thr=0.1, mask_thr=0.5, max_per_img=100))
