# Parity: /root/reference/configs/_base_/models/faster_rcnn_r50_caffe_c4.py
# C4: 3-stage caffe-style ResNet, single stride-16 level, no FPN. The
# reference routes ROIs through a weight-shared res5 (shared_head=ResLayer);
# here a 1x1 ChannelMapper feeds the standard FC bbox head instead — the
# TPU-native ROI path is the fully-batched FC head (same train/test
# protocol, documented deviation; see TridentFasterRCNN test pattern).
model = dict(
    type='FasterRCNN',
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(type='ResNet', depth=50, num_stages=3,
                  strides=(1, 2, 2), dilations=(1, 1, 1),
                  out_indices=(2, ), frozen_stages=1,
                  norm_eval=True, style='caffe'),
    neck=dict(type='ChannelMapper', in_channels=[1024], out_channels=256),
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
