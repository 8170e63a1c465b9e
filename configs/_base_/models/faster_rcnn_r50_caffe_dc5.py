# Parity: /root/reference/configs/_base_/models/faster_rcnn_r50_caffe_dc5.py
# DC5: 4-stage caffe ResNet with stage-4 dilation 2 and stride 1 (output
# stride stays 16); single-level heads as in the C4 recipe.
model = dict(
    type='FasterRCNN',
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
                  out_indices=(3, ), frozen_stages=1,
                  norm_eval=True, style='caffe'),
    neck=dict(type='ChannelMapper', in_channels=[2048], out_channels=256),
    rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=256,
                  anchor_generator=dict(type='AnchorGenerator',
                                        scales=[2, 4, 8, 16, 32],
                                        ratios=[0.5, 1.0, 2.0],
                                        strides=[16])),
    roi_head=dict(type='StandardRoIHead',
                  bbox_head=dict(num_classes=80, in_channels=256),
                  bbox_roi_extractor=dict(featmap_strides=[16])),
    test_cfg=dict(
        rpn=dict(nms_pre=6000, max_per_img=1000),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                  max_per_img=100)))
