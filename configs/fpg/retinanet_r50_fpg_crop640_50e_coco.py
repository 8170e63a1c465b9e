# Parity: /root/reference/configs/fpg/retinanet_r50_fpg_crop640_50e_coco.py
# FPG neck (9 stacked pyramid-grid columns). The reference's per-path
# trans cfgs (same_up/across_lateral/...) are fixed in the TPU FPG
# implementation (conv+GN per cell, see necks/extra_necks.py FPG).
_base_ = '../nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py'
model = dict(
    neck=dict(
        _delete_=True,
        type='FPG',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
        stack_times=9))
