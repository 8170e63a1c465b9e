# Parity: /root/reference/configs/hrnet/cascade_mask_rcnn_hrnetv2p_w32_20e_coco.py
_base_ = './cascade_mask_rcnn_hrnetv2p_w18_20e_coco.py'
model = dict(
    pretrained='open-mmlab://msra/hrnetv2_w32',
    backbone=dict(extra=dict(
        stage2=dict(num_channels=[32, 64]),
        stage3=dict(num_channels=[32, 64, 128]),
        stage4=dict(num_channels=[32, 64, 128, 256]))),
    neck=dict(type='HRFPN', in_channels=[32, 64, 128, 256],
              out_channels=256))
