# Parity: /root/reference/configs/mask_rcnn/mask_rcnn_x101_32x8d_fpn_1x_coco.py
_base_ = './mask_rcnn_r50_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://detectron2/resnext101_32x8d',
    backbone=dict(type='ResNeXt', depth=101, groups=32, base_width=8,
                  norm_cfg=dict(type='BN', requires_grad=False),
                  style='pytorch'))
# detectron2 ResNeXt weights: BGR order with per-channel std
img_norm_cfg = dict(mean=[103.530, 116.280, 123.675],
                    std=[57.375, 57.120, 58.395], to_rgb=False)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='FusedPreprocess', img_scale=(1333, 800),
         size_divisor=32, **img_norm_cfg),
    dict(type='Collect',
         keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='FusedPreprocess', img_scale=(1333, 800),
         size_divisor=32, **img_norm_cfg),
    dict(type='Collect', keys=['img']),
]
data = dict(train=dict(pipeline=train_pipeline),
            val=dict(pipeline=test_pipeline),
            test=dict(pipeline=test_pipeline))
