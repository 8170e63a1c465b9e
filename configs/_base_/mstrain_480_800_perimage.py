# Multi-scale training, short side 480..800 — PER-IMAGE parity mode.
#
# Exact reference semantics (/root/reference/mmdet/datasets/pipelines/
# transforms.py:119 random_sample: per-image Resize img_scale=
# [(1333, 480), (1333, 800)], multiscale_mode='range'): every image samples
# its own short side uniformly from the continuous 480..800 range. Use this
# base for AP-parity runs against reference mstrain checkpoints; the default
# ../_base_/mstrain_480_800.py trades per-image for per-BATCH sampling
# (~1.29x faster epochs, docs/PERF.md) — a deliberate deviation whose AP
# neutrality is unproven, so parity runs must come through THIS base.
#
# Batches still pad to the smallest fitting static bucket, but with
# per-image scales most batches contain a near-800 image, so expect
# max-bucket FLOPs on most steps.
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='FusedPreprocess', img_scale=[(1333, 480), (1333, 800)],
         multiscale_mode='range', size_divisor=32, **img_norm_cfg),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]
data = dict(train=dict(pipeline=train_pipeline))
pad_to = [(480, 1344), (544, 1344), (608, 1344), (672, 1344), (736, 1344),
          (800, 1344),
          (1344, 480), (1344, 544), (1344, 608), (1344, 672), (1344, 736),
          (1344, 800)]
