# FCOS-GFL R-50 1x with center sampling, caffe-style backbone.
# Parity: /root/reference/configs/gfl/fcos_gfl_r50_center.py — Detectron-
# lineage caffe ResNet (stride on conv1, frozen BN affine), caffe
# normalization (BGR order kept, std 1).
_base_ = ['./gfl_r50_fpn_1x_coco.py']
model = dict(
    type='FCOS',
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(
        norm_cfg=dict(type='BN', requires_grad=False),
        style='caffe'),
    neck=dict(add_extra_convs=True, extra_convs_on_inputs=False,
              relu_before_extra_convs=True),
    bbox_head=dict(
        _delete_=True,
        type='FCOSGFLHead',
        num_classes=80,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        strides=[8, 16, 32, 64, 128],
        loss_cls=dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=1.0),
        loss_centerness=dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0),
        center_sampling=True,
        centerness_on_reg=True,
        norm_on_bbox=False,
        reg_max=16),
    test_cfg=dict(nms=dict(type='nms', iou_threshold=0.5)))
img_norm_cfg = dict(
    mean=[103.53, 116.28, 123.675], std=[1.0, 1.0, 1.0], to_rgb=False)
data = dict(
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='FusedPreprocess', img_scale=(1333, 800),
             size_divisor=32, **img_norm_cfg),
        dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
    ]),
    val=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='FusedPreprocess', img_scale=(1333, 800),
             size_divisor=32, **img_norm_cfg),
        dict(type='Collect', keys=['img']),
    ]),
    test=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='FusedPreprocess', img_scale=(1333, 800),
             size_divisor=32, **img_norm_cfg),
        dict(type='Collect', keys=['img']),
    ]))
