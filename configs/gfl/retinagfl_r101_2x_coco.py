# Retina-GFL ResNet-101 2x — teacher for LD-Retina.
# Parity: /root/reference/configs/gfl/retinagfl_r101_2x_coco.py.
_base_ = ['./gfl_r50_fpn_1x_coco.py', '../_base_/mstrain_480_800.py']
model = dict(
    pretrained='torchvision://resnet101',
    backbone=dict(depth=101),
    neck=dict(add_extra_convs='on_input'),
    bbox_head=dict(
        _delete_=True,
        type='RetinaGFLHead',
        num_classes=80,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        anchor_generator=dict(
            type='AnchorGenerator',
            octave_base_scale=4,
            scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0],
            strides=[8, 16, 32, 64, 128]),
        loss_cls=dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
        reg_decoded_bbox=True,
        reg_max=16),
    train_cfg=dict(
        assigner=dict(
            type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4,
            min_pos_iou=0, ignore_iof_thr=-1),
        allowed_border=-1,
        pos_weight=-1))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
optimizer = dict(lr=0.0025)
