# LVIS v1 instance segmentation (1203 classes, federated annotations),
# trained with ClassBalancedDataset oversampling (oversample_thr=1e-3).
# Parity: /root/reference/configs/_base_/datasets/lvis_v1_instance.py.
dataset_type = 'LVISV1Dataset'
data_root = 'data/lvis_v1/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    # reference mstrain (1333, 640..800)
    dict(type='FusedPreprocess', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='range', size_divisor=32, **img_norm_cfg),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='FusedPreprocess', img_scale=(1333, 800), size_divisor=32,
         **img_norm_cfg),
    dict(type='Collect', keys=['img']),
]
max_gts_per_image = 300
pad_to = [(800, 1344), (1344, 800)]
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type='ClassBalancedDataset',
        oversample_thr=1e-3,
        dataset=dict(
            type=dataset_type,
            ann_file=data_root + 'annotations/lvis_v1_train.json',
            img_prefix=data_root,
            pipeline=train_pipeline)),
    val=dict(
        type=dataset_type,
        ann_file=data_root + 'annotations/lvis_v1_val.json',
        img_prefix=data_root,
        pipeline=test_pipeline),
    test=dict(
        type=dataset_type,
        ann_file=data_root + 'annotations/lvis_v1_val.json',
        img_prefix=data_root,
        pipeline=test_pipeline))
evaluation = dict(interval=24, metric=['bbox', 'segm'])
