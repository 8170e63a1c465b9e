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
# CentripetalNet recipe (reference centripetalnet_hourglass104_mstest_16x6_
# 210e_coco.py): same 511x511 center-crop training as CornerNet, Adam 5e-4,
# 210 epochs, step [190].
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile', to_float32=True),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='PhotoMetricDistortion',
         brightness_delta=32, contrast_range=(0.5, 1.5),
         saturation_range=(0.5, 1.5), hue_delta=18),
    dict(type='RandomCenterCropPad', crop_size=(511, 511),
         ratios=(0.6, 0.7, 0.8, 0.9, 1.0, 1.1, 1.2, 1.3),
         test_mode=False, test_pad_mode=None, **img_norm_cfg),
    dict(type='Resize', img_scale=(511, 511), keep_ratio=False),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]
test_pipeline = [
    dict(type='LoadImageFromFile', to_float32=True),
    dict(type='RandomCenterCropPad', crop_size=None, ratios=None,
         border=None, test_mode=True, test_pad_mode=('logical_or', 127),
         **img_norm_cfg),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Collect', keys=['img']),
]
data = dict(samples_per_gpu=6,
            train=dict(pipeline=train_pipeline),
            val=dict(pipeline=test_pipeline),
            test=dict(pipeline=test_pipeline))
pad_to = [(512, 512), (639, 767), (767, 639), (767, 767)]
max_gts_per_image = 80
optimizer = dict(_delete_=True, type='AdamW', lr=0.0005, weight_decay=0.0,
                 betas=(0.9, 0.999))
lr_config = dict(step=[190])
runner = dict(max_epochs=210)
