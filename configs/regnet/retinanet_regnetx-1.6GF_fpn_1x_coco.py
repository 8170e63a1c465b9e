# Parity: /root/reference/configs/regnet/retinanet_regnetx-1.6GF_fpn_1x_coco.py
_base_ = './retinanet_regnetx-3.2GF_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://regnetx_1.6gf',
    backbone=dict(_delete_=True, type='RegNet',
                  arch='regnetx_1.6gf', frozen_stages=1,
                  norm_eval=True),
    neck=dict(in_channels=[72, 168, 408, 912]))
