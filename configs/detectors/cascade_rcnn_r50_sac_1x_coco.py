# Parity: /root/reference/configs/detectors/cascade_rcnn_r50_sac_1x_coco.py
_base_ = '../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py'
model = dict(backbone=dict(
    _delete_=True, type='DetectoRS_ResNet', depth=50, frozen_stages=1,
    sac=dict(type='SAC'), stage_with_sac=(False, True, True, True)))
