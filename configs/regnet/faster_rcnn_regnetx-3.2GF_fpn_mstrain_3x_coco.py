# Parity: /root/reference/configs/regnet/faster_rcnn_regnetx-3.2GF_fpn_mstrain_3x_coco.py
_base_ = ['./faster_rcnn_regnetx-3.2GF_fpn_1x_coco.py',
          '../_base_/mstrain_640_800.py']
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
