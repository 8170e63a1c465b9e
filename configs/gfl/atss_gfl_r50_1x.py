# ATSS-GFL R-50 1x baseline (distributional regression on the ATSS head).
# Parity: /root/reference/configs/gfl/atss_gfl_r50_1x.py (note its
# lr=0.0025 — the 1-GPU linear-scaled rate the authors shipped).
_base_ = ['./gfl_r50_fpn_1x_coco.py']
model = dict(
    type='ATSS',
    bbox_head=dict(
        _delete_=True,
        type='ATSSGFLHead',
        num_classes=80,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        anchor_generator=dict(
            type='AnchorGenerator',
            ratios=[1.0],
            octave_base_scale=8,
            scales_per_octave=1,
            strides=[8, 16, 32, 64, 128]),
        loss_cls=dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
        loss_centerness=dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0),
        reg_max=16))
optimizer = dict(lr=0.0025)
