# SABL Faster R-CNN: side-aware bucketing bbox head in the ROI stage.
# Parity: /root/reference/configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py
# (full side-aware tower: attention pool + 1-D post convs + reg_feat_up_ratio
# ConvTranspose upsample — see heads/roi_head.py SABLBBoxHeadNet).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    roi_head=dict(
        bbox_head=dict(
            _delete_=True,
            type='SABLHead',
            num_classes=80,
            in_channels=256,
            fc_out_channels=1024,
            conv_out_channels=256,
            bbox_coder=dict(type='BucketingBBoxCoder', num_buckets=14,
                            scale_factor=1.7),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                          loss_weight=1.0),
            loss_bbox_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                               loss_weight=1.0),
            loss_bbox_reg=dict(type='SmoothL1Loss', beta=0.1,
                               loss_weight=1.0))))
