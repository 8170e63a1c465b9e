# Parity: /root/reference/configs/mask_rcnn/mask_rcnn_x101_32x8d_fpn_mstrain-poly_1x_coco.py
_base_ = ['./mask_rcnn_x101_32x8d_fpn_1x_coco.py',
          '../_base_/mstrain_640_800.py']
