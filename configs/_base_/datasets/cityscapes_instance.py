# Cityscapes instance segmentation.
# Parity: /root/reference/configs/_base_/datasets/cityscapes_instance.py.
_base_ = './cityscapes_detection.py'
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='FusedPreprocess', img_scale=[(2048, 800), (2048, 1024)],
         multiscale_mode='range', size_divisor=32,
         mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
         to_rgb=True),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks']),
]
data = dict(train=dict(pipeline=train_pipeline))
evaluation = dict(interval=1, metric=['bbox', 'segm'])
