# Parity: /root/reference/configs/_base_/models/fast_rcnn_r50_fpn.py
# (trains the ROI head on precomputed proposals — batch['proposals'])
model = dict(
    type='FastRCNN',
    pretrained='torchvision://resnet50',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5),
    roi_head=dict(type='StandardRoIHead',
                  bbox_head=dict(num_classes=80, in_channels=256),
                  bbox_roi_extractor=dict(featmap_strides=[4, 8, 16, 32])),
    test_cfg=dict(
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                  max_per_img=100)))
