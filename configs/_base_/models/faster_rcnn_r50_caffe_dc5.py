# Parity: /root/reference/configs/_base_/models/faster_rcnn_r50_caffe_dc5.py
# DC5: 4-stage caffe ResNet with stage-4 dilation 2 and stride 1 (output
# stride stays 16); no FPN — the RPN and the 7x7 roi extractor read the
# 2048-channel dilated C5 directly.
norm_cfg = dict(type='BN', requires_grad=False)
model = dict(
    type='FasterRCNN',
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
                  out_indices=(3, ), frozen_stages=1, norm_cfg=norm_cfg,
                  norm_eval=True, style='caffe'),
    rpn_head=dict(type='RPNHead', in_channels=2048, feat_channels=2048,
                  anchor_generator=dict(type='AnchorGenerator',
                                        scales=[2, 4, 8, 16, 32],
                                        ratios=[0.5, 1.0, 2.0],
                                        strides=[16])),
    roi_head=dict(
        type='StandardRoIHead',
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=7,
                           sampling_ratio=0),
            out_channels=2048, featmap_strides=[16]),
        bbox_head=dict(type='Shared2FCBBoxHead', in_channels=2048,
                       fc_out_channels=1024, roi_feat_size=7,
                       num_classes=80)),
    train_cfg=dict(
        rpn=dict(sampler=dict(num=256, pos_fraction=0.5,
                              add_gt_as_proposals=False),
                 allowed_border=0),
        rpn_proposal=dict(nms_pre=12000, max_per_img=2000,
                          nms=dict(type='nms', iou_threshold=0.7)),
        rcnn=dict(sampler=dict(num=512, pos_fraction=0.25,
                               add_gt_as_proposals=True))),
    test_cfg=dict(
        rpn=dict(nms_pre=6000, max_per_img=1000,
                 nms=dict(type='nms', iou_threshold=0.7)),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                  max_per_img=100)))
