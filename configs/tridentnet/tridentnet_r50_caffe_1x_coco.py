# Parity: /root/reference/configs/tridentnet/tridentnet_r50_caffe_1x_coco.py
# (C4 trident backbone; branch fold B->3B handled in TridentFasterRCNN)
_base_ = [
    '../_base_/models/faster_rcnn_r50_caffe_c4.py',
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='TridentFasterRCNN',
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(type='TridentResNet', trident_dilations=(1, 2, 3),
                  num_branch=3, test_branch_idx=1),
    roi_head=dict(type='TridentRoIHead', num_branch=3, test_branch_idx=1),
    train_cfg=dict(
        rpn_proposal=dict(max_per_img=500),
        rcnn=dict(sampler=dict(num=128, pos_fraction=0.5,
                               add_gt_as_proposals=False))))
