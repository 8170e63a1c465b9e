# Parity: /root/reference/configs/regnet/mask_rcnn_regnetx-8GF_fpn_1x_coco.py
_base_ = './mask_rcnn_regnetx-3.2GF_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://regnetx_8.0gf',
    backbone=dict(_delete_=True, type='RegNet',
                  arch='regnetx_8.0gf', frozen_stages=1,
                  norm_eval=True),
    neck=dict(in_channels=[80, 240, 720, 1920]))
