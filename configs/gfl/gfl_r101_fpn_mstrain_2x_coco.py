# GFL ResNet-101 multi-scale 2x — the standard LD teacher.
# Parity: /root/reference/configs/gfl/gfl_r101_fpn_mstrain_2x_coco.py.
_base_ = ['./gfl_r50_fpn_1x_coco.py', '../_base_/mstrain_480_800.py']
model = dict(
    pretrained='torchvision://resnet101',
    backbone=dict(depth=101),
    bbox_head=dict(loss_bbox=dict(type='GIoULoss', loss_weight=2.0)))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
