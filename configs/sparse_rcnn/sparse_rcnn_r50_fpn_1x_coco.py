# Parity: /root/reference/configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='SparseRCNN',
    pretrained='torchvision://resnet50',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5),
    rpn_head=dict(type='EmbeddingRPNHead', num_proposals=100),
    roi_head=dict(type='SparseRoIHead', num_stages=6,
                  bbox_head=[dict(num_classes=80)] * 6),
    test_cfg=dict(max_per_img=100))
