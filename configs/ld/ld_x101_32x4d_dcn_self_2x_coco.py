# Self-LD: X-101-32x4d-DCN teacher -> X-101-32x4d-DCN student
# (val AP 47.5 vs 46.9 baseline).
# Parity: /root/reference README.md:148 (self-LD X-101-32x4d-DCN row);
# backbone spec mirrors gfl_x101_32x4d_fpn_dconv_c4-c5_mstrain_2x_coco.
_base_ = ['./ld_x101_self_2x_coco.py']
teacher_ckpt = 'checkpoints/gfl_x101_32x4d_dcn_2x_coco.ckpt'
model = dict(
    pretrained='open-mmlab://resnext101_32x4d',
    teacher_config=(
        'configs/gfl/gfl_x101_32x4d_fpn_dconv_c4-c5_mstrain_2x_coco.py'),
    teacher_ckpt=teacher_ckpt,
    backbone=dict(
        dcn=dict(type='DCNv2', deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, False, True, True)))
