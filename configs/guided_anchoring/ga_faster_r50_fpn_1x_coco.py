# Parity: /root/reference/configs/guided_anchoring/ga_faster_r50_fpn_1x_coco.py
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    rpn_head=dict(
        _delete_=True, type='GARPNHead', in_channels=256,
        feat_channels=256,
        approx_anchor_generator=dict(
            type='AnchorGenerator', octave_base_scale=8,
            scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
            strides=[4, 8, 16, 32, 64]),
        square_anchor_generator=dict(
            type='AnchorGenerator', ratios=[1.0], scales=[8],
            strides=[4, 8, 16, 32, 64])),
    roi_head=dict(bbox_head=dict(
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0., 0., 0., 0.],
                        target_stds=[0.05, 0.05, 0.1, 0.1]))))
train_cfg = dict(
    rpn_proposal=dict(nms_pre=1000, max_per_img=300,
                      nms=dict(iou_threshold=0.7)),
    rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.6,
                            neg_iou_thr=0.6, min_pos_iou=0.6),
              sampler=dict(num=256, pos_fraction=0.25)))
test_cfg = dict(rpn=dict(nms_pre=1000, max_per_img=300,
                         nms=dict(iou_threshold=0.7)))
