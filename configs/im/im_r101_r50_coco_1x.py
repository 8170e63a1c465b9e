# Feature-imitation study: R-101 teacher -> R-50 student.
# Parity: /root/reference/configs/im/im_r101_r50_coco_1x.py.
_base_ = ['./im_r101_r18_coco_1x.py']
model = dict(
    pretrained='torchvision://resnet50',
    backbone=dict(depth=50),
    neck=dict(in_channels=[256, 512, 1024, 2048]))
