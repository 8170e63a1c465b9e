# Parity: /root/reference/configs/resnest/faster_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_1x_coco.py
# ResNeSt-50 Faster R-CNN; live backbone BN (per-device-batch BN as
# the SyncBN), ResNeSt stats, 640..800 range mstrain. DEVIATION: no
# SyncBN inside the roi-head FC tower (norm-free heads kept).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py',
          '../_base_/mstrain_640_800.py']
model = dict(
    pretrained='open-mmlab://resnest50',
    backbone=dict(
        _delete_=True, type='ResNeSt', stem_channels=64, depth=50,
        radix=2, reduction_factor=4, avg_down_stride=True,
        num_stages=4, out_indices=(0, 1, 2, 3), frozen_stages=1,
        norm_eval=False, style='pytorch'))
img_norm_cfg = dict(mean=[123.68, 116.779, 103.939],
                    std=[58.393, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='FusedPreprocess', img_scale=(1333, 800),
         size_divisor=32, **img_norm_cfg),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
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
