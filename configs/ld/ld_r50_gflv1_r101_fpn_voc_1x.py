# LD on VOC: R-101 teacher -> R-50 student, 4 epochs (val AP5095 56.1 vs
# 55.8 baseline). Parity: /root/reference README.md:180 (published row,
# no shipped config; recipe mirrors ld_r18_gflv1_r101_fpn_voc_1x.py).
_base_ = ['./ld_r18_gflv1_r101_fpn_voc_1x.py']
model = dict(
    pretrained='torchvision://resnet50',
    backbone=dict(depth=50),
    neck=dict(in_channels=[256, 512, 1024, 2048]))
