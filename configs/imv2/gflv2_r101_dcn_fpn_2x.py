# Parity: /root/reference/configs/imv2/gflv2_r101_dcn_fpn_2x.py
# GFocalV2 R-101-DCN 2x — imitation-study teacher
_base_ = '../gfl/gflv2_r101_fpn_2x_coco.py'
model = dict(backbone=dict(
    dcn=dict(type='DCNv2', deform_groups=1, fallback_on_stride=False),
    stage_with_dcn=(False, True, True, True)))
