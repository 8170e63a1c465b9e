# Detectron-lineage caffe preprocessing (FCOS / guided-anchoring caffe
# weights): BGR order, mean [102.9801, 115.9465, 122.7717], std 1.
img_norm_cfg = dict(mean=[102.9801, 115.9465, 122.7717],
                    std=[1.0, 1.0, 1.0], to_rgb=False)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='FusedPreprocess', img_scale=(1333, 800), size_divisor=32,
         **img_norm_cfg),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='FusedPreprocess', img_scale=(1333, 800), size_divisor=32,
         **img_norm_cfg),
    dict(type='Collect', keys=['img']),
]
data = dict(train=dict(pipeline=train_pipeline),
            val=dict(pipeline=test_pipeline),
            test=dict(pipeline=test_pipeline))
