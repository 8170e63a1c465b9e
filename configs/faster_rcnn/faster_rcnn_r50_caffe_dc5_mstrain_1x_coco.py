# Parity: /root/reference/configs/faster_rcnn/faster_rcnn_r50_caffe_dc5_mstrain_1x_coco.py
_base_ = ['./faster_rcnn_r50_caffe_dc5_1x_coco.py',
          '../_base_/mstrain_640_800.py']
