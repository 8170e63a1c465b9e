# Parity: /root/reference/configs/_base_/models/mask_rcnn_r50_caffe_c4.py
# C4 Mask R-CNN: bbox AND mask branches share the res5 head; the mask
# branch has no extractor of its own (mask_roi_extractor=None) — it pools
# 14x14 from C4, runs res5 (-> 7x7x2048), then a conv-free FCN mask head
# whose deconv upsamples back to 14x14.
norm_cfg = dict(type='BN', requires_grad=False)
model = dict(
    type='MaskRCNN',
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(type='ResNet', depth=50, num_stages=3,
                  strides=(1, 2, 2), dilations=(1, 1, 1),
                  out_indices=(2, ), frozen_stages=1, norm_cfg=norm_cfg,
                  norm_eval=True, style='caffe'),
    rpn_head=dict(type='RPNHead', in_channels=1024, feat_channels=1024,
                  anchor_generator=dict(type='AnchorGenerator',
                                        scales=[2, 4, 8, 16, 32],
                                        ratios=[0.5, 1.0, 2.0],
                                        strides=[16])),
    roi_head=dict(
        type='StandardRoIHead',
        shared_head=dict(type='ResLayer', depth=50, stage=3, stride=2,
                         dilation=1, style='caffe', norm_cfg=norm_cfg,
                         norm_eval=True),
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=1024, featmap_strides=[16]),
        bbox_head=dict(type='BBoxHead', with_avg_pool=True,
                       roi_feat_size=7, in_channels=2048, num_classes=80),
        mask_roi_extractor=None,
        mask_head=dict(type='FCNMaskHead', num_convs=0, in_channels=2048,
                       conv_out_channels=256, num_classes=80)),
    train_cfg=dict(
        rpn=dict(sampler=dict(num=256, pos_fraction=0.5,
                              add_gt_as_proposals=False),
                 allowed_border=0),
        rpn_proposal=dict(nms_pre=12000, max_per_img=2000,
                          nms=dict(type='nms', iou_threshold=0.7)),
        rcnn=dict(sampler=dict(num=512, pos_fraction=0.25,
                               add_gt_as_proposals=True),
                  mask_size=14)),
    test_cfg=dict(
        rpn=dict(nms_pre=6000, max_per_img=1000,
                 nms=dict(type='nms', iou_threshold=0.7)),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                  max_per_img=100, mask_thr_binary=0.5)))
