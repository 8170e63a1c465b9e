# SABL Cascade R-CNN: bucketing bbox heads in all three cascade stages.
# Parity: /root/reference/configs/sabl/sabl_cascade_rcnn_r50_fpn_1x_coco.py
# (per-stage BucketingBBoxCoder scale_factors 1.7/1.5/1.3; routed
# to CascadeSABLRoIHead by TwoStageDetector).
_base_ = '../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py'
model = dict(
    roi_head=dict(bbox_head=[
        dict(
            type='SABLHead',
            num_classes=80,
            cls_in_channels=256,
            reg_in_channels=256,
            roi_feat_size=7,
            cls_out_channels=1024,
            reg_cls_out_channels=256,
            reg_class_agnostic=True,
            bbox_coder=dict(
                type='BucketingBBoxCoder', num_buckets=14,
                scale_factor=1.7),
            loss_cls=dict(
                type='CrossEntropyLoss', use_sigmoid=False, loss_weight=1.0),
            loss_bbox_cls=dict(
                type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0),
            loss_bbox_reg=dict(type='SmoothL1Loss', beta=0.1,
                               loss_weight=1.0)),
        dict(
            type='SABLHead',
            num_classes=80,
            cls_in_channels=256,
            reg_in_channels=256,
            roi_feat_size=7,
            cls_out_channels=1024,
            reg_cls_out_channels=256,
            reg_class_agnostic=True,
            bbox_coder=dict(
                type='BucketingBBoxCoder', num_buckets=14,
                scale_factor=1.5),
            loss_cls=dict(
                type='CrossEntropyLoss', use_sigmoid=False, loss_weight=1.0),
            loss_bbox_cls=dict(
                type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0),
            loss_bbox_reg=dict(type='SmoothL1Loss', beta=0.1,
                               loss_weight=1.0)),
        dict(
            type='SABLHead',
            num_classes=80,
            cls_in_channels=256,
            reg_in_channels=256,
            roi_feat_size=7,
            cls_out_channels=1024,
            reg_cls_out_channels=256,
            reg_class_agnostic=True,
            bbox_coder=dict(
                type='BucketingBBoxCoder', num_buckets=14,
                scale_factor=1.3),
            loss_cls=dict(
                type='CrossEntropyLoss', use_sigmoid=False, loss_weight=1.0),
            loss_bbox_cls=dict(
                type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0),
            loss_bbox_reg=dict(type='SmoothL1Loss', beta=0.1,
                               loss_weight=1.0))
    ]))
