# Parity: /root/reference/configs/cascade_rcnn/cascade_mask_rcnn_r50_caffe_fpn_1x_coco.py
_base_ = ['./cascade_mask_rcnn_r50_fpn_1x_coco.py',
          '../_base_/caffe_norm_instance.py']
model = dict(
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(norm_cfg=dict(type='BN', requires_grad=False),
                  style='caffe'))
