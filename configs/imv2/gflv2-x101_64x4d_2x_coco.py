# Parity: /root/reference/configs/imv2/gflv2-x101_64x4d_2x_coco.py
_base_ = '../gfl/gflv2_r101_fpn_2x_coco.py'
model = dict(
    pretrained='open-mmlab://resnext101_64x4d',
    backbone=dict(type='ResNeXt', depth=101, groups=64,
                  base_width=4))
