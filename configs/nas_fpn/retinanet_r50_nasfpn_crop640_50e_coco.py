# Parity: /root/reference/configs/nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='RetinaNet',
    # reference trains this recipe with LIVE BN (norm_eval=False): stats
    # update on unfrozen stages; frozen stage 1 + stem stay in eval mode
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_eval=False, style='pytorch'),
    neck=dict(type='NASFPN', in_channels=[512, 1024, 2048],
              out_channels=256, num_outs=5, stack_times=7, start_level=1),
    bbox_head=dict(type='RetinaSepBNHead', num_classes=80, num_ins=5,
                   in_channels=256),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=100))
