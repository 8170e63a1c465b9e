# Parity: /root/reference/configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py
_base_ = ['./point_rend_r50_caffe_fpn_1x_coco.py',
          '../_base_/mstrain_640_800.py']
