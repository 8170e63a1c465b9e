# Parity: /root/reference/configs/sparse_rcnn/sparse_rcnn_r50_fpn_mstrain_480-800_3x_coco.py
_base_ = ['./sparse_rcnn_r50_fpn_1x_coco.py',
          '../_base_/mstrain_480_800.py']
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
