# Parity: /root/reference/configs/detectors/cascade_rcnn_r50_rfp_1x_coco.py
_base_ = '../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py'
model = dict(
    backbone=dict(_delete_=True, type='DetectoRS_ResNet', depth=50,
                  frozen_stages=1),
    neck=dict(_delete_=True, type='RFP',
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              num_outs=5, rfp_steps=2),
)
