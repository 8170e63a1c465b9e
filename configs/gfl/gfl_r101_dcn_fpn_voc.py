# GFL R-101-DCN VOC teacher (for the R101-DCN->R34 / ->R101 VOC LD rows).
# Parity: /root/reference README.md:182,184 teacher; DCN spec mirrors
# gfl_r101_fpn_dconv_c3-c5_mstrain_2x_coco, VOC recipe mirrors
# gfl_r101_fpn_voc.
_base_ = ['./gfl_r101_fpn_voc.py']
model = dict(
    backbone=dict(
        dcn=dict(type='DCNv2', deform_groups=1),
        stage_with_dcn=(False, True, True, True)))
