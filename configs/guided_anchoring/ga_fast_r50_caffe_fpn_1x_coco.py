# Parity: /root/reference/configs/guided_anchoring/ga_fast_r50_caffe_fpn_1x_coco.py
_base_ = ['../fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py',
          '../_base_/caffe_norm_detection.py']
# Fast R-CNN consuming GA-RPN proposals (proposal files from
# ga_rpn_r50_caffe_fpn; tools/misc/gen_proposals equivalent)
model = dict(
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(norm_cfg=dict(type='BN', requires_grad=False),
                  style='caffe'))
train_cfg = dict(rcnn=dict(
    assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.6,
                  neg_iou_thr=0.6, min_pos_iou=0.6),
    sampler=dict(num=256, pos_fraction=0.25)))
