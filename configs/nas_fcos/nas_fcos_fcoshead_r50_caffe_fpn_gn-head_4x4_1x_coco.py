# Parity: /root/reference/configs/nas_fcos/nas_fcos_fcoshead_r50_caffe_fpn_gn-head_4x4_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='NASFCOS',
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN', requires_grad=False),
                  style='caffe'),
    neck=dict(type='NASFCOS_FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, num_outs=5),
    bbox_head=dict(type='FCOSHead', num_classes=80, in_channels=256,
                   feat_channels=256,
                   strides=[8, 16, 32, 64, 128],
                   norm_cfg=dict(type='GN', num_groups=32)),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.6),
                  max_per_img=100))
data = dict(samples_per_gpu=4)
optimizer = dict(
    lr=0.01, paramwise_cfg=dict(bias_lr_mult=2., bias_decay_mult=0.))
