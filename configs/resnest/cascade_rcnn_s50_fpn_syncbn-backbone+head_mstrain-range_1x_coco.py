# Cascade R-CNN with ResNeSt-50 backbone.
# Parity: /root/reference/configs/resnest/
# cascade_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_1x_coco.py —
# ResNeSt normalization (mean 123.68/116.779/103.939), mstrain short side
# 640..800 (per-image range draw via the loader default; grid endpoints below), live backbone BN
# (the SyncBN there; the SPMD per-device-batch BN here). DEVIATION: the
# reference also puts SyncBN inside the Shared4Conv1FCBBoxHead towers;
# this config keeps the default norm-free cascade heads.
_base_ = ['../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py']
model = dict(
    pretrained='open-mmlab://resnest50',
    backbone=dict(
        _delete_=True,
        type='ResNeSt',
        stem_channels=64,
        depth=50,
        radix=2,
        reduction_factor=4,
        avg_down_stride=True,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=False,
        style='pytorch'))
img_norm_cfg = dict(
    mean=[123.68, 116.779, 103.939], std=[58.393, 57.12, 57.375],
    to_rgb=True)
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
# mstrain range 640..800: per-image draw between the endpoint scales
# (loader default scale_sampling='image_range'); grid kept for the
# opt-in per-batch speed mode
batch_scales = [(1333, 640), (1333, 672), (1333, 704), (1333, 736),
                (1333, 768), (1333, 800)]
pad_to = [(640, 1344), (672, 1344), (704, 1344), (736, 1344), (768, 1344),
          (800, 1344),
          (1344, 640), (1344, 672), (1344, 704), (1344, 736), (1344, 768),
          (1344, 800)]
