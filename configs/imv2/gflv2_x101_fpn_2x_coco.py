# Parity: /root/reference/configs/imv2/gflv2_x101_fpn_2x_coco.py
_base_ = '../gfl/gflv2_r101_fpn_2x_coco.py'
model = dict(
    pretrained='open-mmlab://resnext101_32x4d',
    backbone=dict(type='ResNeXt', depth=101, groups=32,
                  base_width=4))
