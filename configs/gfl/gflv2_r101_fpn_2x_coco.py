# GFocalV2 ResNet-101 2x — the LDv2 teacher.
# Parity: configs/gfl/gflv2_r101_fpn_2x_coco.py referenced by
# /root/reference/configs/ldv2/ld_r50_gflv2_r101_fpn_1x.py.
_base_ = ['./gflv2_r50_fpn_1x_coco.py', '../_base_/mstrain_480_800.py']
model = dict(
    pretrained='torchvision://resnet101',
    backbone=dict(depth=101))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
