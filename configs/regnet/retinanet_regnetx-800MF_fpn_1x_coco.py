# Parity: /root/reference/configs/regnet/retinanet_regnetx-800MF_fpn_1x_coco.py
_base_ = './retinanet_regnetx-3.2GF_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://regnetx_800mf',
    backbone=dict(_delete_=True, type='RegNet',
                  arch='regnetx_800mf', frozen_stages=1,
                  norm_eval=True),
    neck=dict(in_channels=[64, 128, 288, 672]))
