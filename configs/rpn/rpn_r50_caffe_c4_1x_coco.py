# Parity: /root/reference/configs/rpn/rpn_r50_caffe_c4_1x_coco.py
_base_ = [
    '../_base_/models/rpn_r50_caffe_c4.py',
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_label=False),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='FusedPreprocess', img_scale=(1333, 800), size_divisor=32,
         mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
         to_rgb=True),
    dict(type='Collect', keys=['img', 'gt_bboxes']),
]
data = dict(train=dict(pipeline=train_pipeline))
evaluation = dict(interval=1, metric='proposal_fast')
