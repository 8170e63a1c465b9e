# Parity: /root/reference/configs/imv2/im_gflv2_r2n101_dcn_self-2x.py
# self-imitation: the r2n101-dcn model distills its own trained copy
_base_ = './im_r101_gflv2_r101_dcn_2x.py'
model = dict(
    pretrained='open-mmlab://res2net101_v1d_26w_4s',
    backbone=dict(
        _delete_=True, type='Res2Net', depth=101, scales=4,
        base_width=26, frozen_stages=1, norm_eval=True,
        dcn=dict(type='DCNv2', deform_groups=1,
                 fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True)),
    teacher_config='configs/imv2/gflv2_r2n101_dcn_fpn_2x.py',
    teacher_ckpt='checkpoints/gflv2_r2n101_dcn_fpn_2x.ckpt')
