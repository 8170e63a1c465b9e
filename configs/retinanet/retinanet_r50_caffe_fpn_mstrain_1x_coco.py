# Parity: /root/reference/configs/retinanet/retinanet_r50_caffe_fpn_mstrain_1x_coco.py
_base_ = ['./retinanet_r50_caffe_fpn_1x_coco.py',
          '../_base_/mstrain_640_800.py']
