# GFL ResNet-34 1x baseline (AP 38.9).
_base_ = ['./gfl_r50_fpn_1x_coco.py']
model = dict(
    pretrained='torchvision://resnet34',
    backbone=dict(depth=34),
    neck=dict(in_channels=[64, 128, 256, 512]))
