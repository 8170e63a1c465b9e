# Parity: /root/reference/configs/cascade_rpn/crpn_fast_rcnn_r50_caffe_fpn_1x_coco.py
# (Fast R-CNN trained on Cascade-RPN proposals)
_base_ = '../fast_rcnn/fast_rcnn_r50_caffe_fpn_1x_coco.py'
model = dict(
    roi_head=dict(
        bbox_head=dict(
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[0.04, 0.04, 0.08, 0.08]),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                          loss_weight=1.5),
            loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                           loss_weight=1.0))),
    train_cfg=dict(
        rcnn=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.65,
                          neg_iou_thr=0.65, min_pos_iou=0.65,
                          ignore_iof_thr=-1),
            sampler=dict(type='RandomSampler', num=256, pos_fraction=0.5,
                         neg_pos_ub=-1, add_gt_as_proposals=True),
            pos_weight=-1)),
    test_cfg=dict(
        rcnn=dict(score_thr=0.03, nms=dict(iou_threshold=0.5),
                  max_per_img=100)))
data_root = 'data/coco/'
data = dict(
    train=dict(proposal_file=data_root +
               'proposals/crpn_r50_caffe_fpn_1x_train2017.pkl'),
    val=dict(proposal_file=data_root +
             'proposals/crpn_r50_caffe_fpn_1x_val2017.pkl'),
    test=dict(proposal_file=data_root +
              'proposals/crpn_r50_caffe_fpn_1x_val2017.pkl'))
