# Cascade R-CNN with ResNeSt-50 backbone (SyncBN-in-backbone recipe; on TPU
# the data-parallel step computes BN over the per-device batch — the SPMD
# analogue — with live stats via norm_eval=False).
# Parity: /root/reference/configs/resnest/
# cascade_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_1x_coco.py.
_base_ = ['../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py',
          '../_base_/mstrain_480_800.py']
model = dict(
    pretrained='open-mmlab://resnest50',
    backbone=dict(
        _delete_=True,
        type='ResNeSt',
        stem_channels=64,
        depth=50,
        radix=2,
        reduction_factor=4,
        avg_down_stride=True,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=False,
        style='pytorch'))
