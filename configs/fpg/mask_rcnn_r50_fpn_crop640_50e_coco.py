# Parity: /root/reference/configs/fpg/mask_rcnn_r50_fpn_crop640_50e_coco.py
# (the plain-FPN 640-crop baseline the FPG rows compare against)
_base_ = [
    '../_base_/models/mask_rcnn_r50_fpn.py',
    '../_base_/datasets/coco_detection.py',
    '../_base_/default_runtime.py',
]
model = dict(neck=dict(norm_cfg=dict(type='BN', requires_grad=True)))

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='RandomCrop', crop_size=(640, 640)),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='FusedPreprocess', img_scale=(640, 640), keep_ratio=False,
         size_divisor=64, **img_norm_cfg),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='FusedPreprocess', img_scale=(640, 640), keep_ratio=False,
         size_divisor=64, **img_norm_cfg),
    dict(type='Collect', keys=['img']),
]
pad_to = [(640, 640)]
data = dict(samples_per_gpu=8,
            train=dict(pipeline=train_pipeline),
            val=dict(pipeline=test_pipeline),
            test=dict(pipeline=test_pipeline))
# 50-epoch cosine-ish step schedule at higher lr (reference uses 50e)
optimizer = dict(type='SGD', lr=0.08, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', warmup='linear', warmup_iters=1000,
                 warmup_ratio=0.1, step=[30, 40])
runner = dict(type='EpochBasedRunner', max_epochs=50)
