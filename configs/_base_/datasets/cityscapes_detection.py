# Cityscapes detection (8 instance classes, COCO-format jsons).
# Parity: /root/reference/configs/_base_/datasets/cityscapes_detection.py.
dataset_type = 'CityscapesDataset'
data_root = 'data/cityscapes/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    # reference mstrain [(2048, 800), (2048, 1024)]; per-batch scale jitter
    dict(type='FusedPreprocess', img_scale=[(2048, 800), (2048, 1024)],
         multiscale_mode='range', size_divisor=32, **img_norm_cfg),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='FusedPreprocess', img_scale=(2048, 1024), size_divisor=32,
         **img_norm_cfg),
    dict(type='Collect', keys=['img']),
]
max_gts_per_image = 100
pad_to = [(1024, 2048)]
data = dict(
    samples_per_gpu=1,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        ann_file=data_root +
        'annotations/instancesonly_filtered_gtFine_train.json',
        img_prefix=data_root + 'leftImg8bit/train/',
        pipeline=train_pipeline),
    val=dict(
        type=dataset_type,
        ann_file=data_root +
        'annotations/instancesonly_filtered_gtFine_val.json',
        img_prefix=data_root + 'leftImg8bit/val/',
        pipeline=test_pipeline),
    test=dict(
        type=dataset_type,
        ann_file=data_root +
        'annotations/instancesonly_filtered_gtFine_test.json',
        img_prefix=data_root + 'leftImg8bit/test/',
        pipeline=test_pipeline))
evaluation = dict(interval=1, metric='bbox')
