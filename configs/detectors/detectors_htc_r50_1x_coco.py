# DetectoRS recipe (SAC backbone + RFP neck + HTC head); parity:
# /root/reference/configs/detectors/detectors_htc_r50_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='HybridTaskCascade',
    backbone=dict(type='DetectoRS_ResNet', depth=50, frozen_stages=1,
                  sac=dict(type='SAC'),
                  stage_with_sac=(False, True, True, True)),
    neck=dict(type='RFP', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5, rfp_steps=2),
    rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=256),
    roi_head=dict(type='HybridTaskCascadeRoIHead', num_stages=3,
                  stage_loss_weights=[1, 0.5, 0.25],
                  bbox_head=dict(num_classes=80, in_channels=256),
                  mask_head=dict(num_convs=4, conv_out_channels=256),
                  semantic_head=dict(num_classes=183,
                                     conv_out_channels=256),
                  bbox_roi_extractor=dict(featmap_strides=[4, 8, 16, 32])),
    test_cfg=dict(
        rpn=dict(nms_pre=1000, max_per_img=1000),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                  max_per_img=100)))
