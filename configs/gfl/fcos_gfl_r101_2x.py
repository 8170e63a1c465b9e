# FCOS-GFL ResNet-101 2x — teacher for LD-FCOS.
# Parity: the FCOS teacher used by /root/reference/configs/ld/ld_r50_fcos_r101_1x.py.
_base_ = ['./gfl_r50_fpn_1x_coco.py', '../_base_/mstrain_480_800.py']
model = dict(
    pretrained='torchvision://resnet101',
    backbone=dict(depth=101),
    neck=dict(add_extra_convs=True, extra_convs_on_inputs=False,
              relu_before_extra_convs=True),
    bbox_head=dict(
        _delete_=True,
        type='FCOSGFLHead',
        num_classes=80,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        strides=[8, 16, 32, 64, 128],
        loss_cls=dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=1.0),
        loss_centerness=dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0),
        center_sampling=True,
        centerness_on_reg=True,
        norm_on_bbox=False,
        reg_max=16))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
