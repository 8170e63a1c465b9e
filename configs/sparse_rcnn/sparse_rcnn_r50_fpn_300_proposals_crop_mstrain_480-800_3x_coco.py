# Parity: /root/reference/configs/sparse_rcnn/sparse_rcnn_r50_fpn_300_proposals_crop_mstrain_480-800_3x_coco.py
_base_ = './sparse_rcnn_r50_fpn_mstrain_480-800_3x_coco.py'
num_proposals = 300
model = dict(rpn_head=dict(num_proposals=num_proposals),
             test_cfg=dict(max_per_img=num_proposals))
# DETR-style crop augmentation (AutoAugment double-resize policy)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='AutoAugment', policies=[
        [dict(type='Resize',
              img_scale=[(480, 1333), (512, 1333), (544, 1333),
                         (576, 1333), (608, 1333), (640, 1333),
                         (672, 1333), (704, 1333), (736, 1333),
                         (768, 1333), (800, 1333)],
              multiscale_mode='value', keep_ratio=True)],
        [dict(type='Resize',
              img_scale=[(400, 1333), (500, 1333), (600, 1333)],
              multiscale_mode='value', keep_ratio=True),
         dict(type='RandomCrop', crop_type='absolute_range',
              crop_size=(384, 600), allow_negative_crop=True),
         dict(type='Resize',
              img_scale=[(480, 1333), (512, 1333), (544, 1333),
                         (576, 1333), (608, 1333), (640, 1333),
                         (672, 1333), (704, 1333), (736, 1333),
                         (768, 1333), (800, 1333)],
              multiscale_mode='value', override=True,
              keep_ratio=True)],
    ]),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]
data = dict(train=dict(pipeline=train_pipeline))
