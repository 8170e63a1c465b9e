# GFL R-101 with DCNv2 (stages 2-4), mstrain 2x — the strongest LD teacher
# (LD R-101-DCN -> R-101: val AP 45.4).
# Parity: /root/reference/configs/gfl teacher with dcn
# (gfl_r101_fpn_dconv_c3-c5_mstrain_2x_coco).
_base_ = ['./gfl_r101_fpn_mstrain_2x_coco.py']
model = dict(
    backbone=dict(
        dcn=dict(type='DCNv2', deform_groups=1),
        stage_with_dcn=(False, True, True, True)))
