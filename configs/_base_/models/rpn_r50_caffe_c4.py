# Parity: /root/reference/configs/_base_/models/rpn_r50_caffe_c4.py
# Standalone RPN on the raw 1024-channel C4 level, no FPN.
norm_cfg = dict(type='BN', requires_grad=False)
model = dict(
    type='RPN',
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
    train_cfg=dict(
        rpn=dict(sampler=dict(num=256, pos_fraction=0.5,
                              add_gt_as_proposals=False),
                 allowed_border=0)),
    test_cfg=dict(nms_pre=12000, max_per_img=2000,
                  nms=dict(type='nms', iou_threshold=0.7)))
