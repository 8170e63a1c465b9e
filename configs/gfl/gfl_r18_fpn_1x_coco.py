# GFL ResNet-18 1x baseline (AP 35.8).
# Parity: /root/reference/configs/gfl/gfl_r18_fpn_1x_coco.py.
_base_ = ['./gfl_r50_fpn_1x_coco.py']
model = dict(
    pretrained='torchvision://resnet18',
    backbone=dict(depth=18),
    neck=dict(in_channels=[64, 128, 256, 512]))
