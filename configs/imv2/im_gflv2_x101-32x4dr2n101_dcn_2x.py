# Parity: /root/reference/configs/imv2/im_gflv2_x101-32x4dr2n101_dcn_2x.py
# X-101-32x4d student <- Res2Net-101-DCN teacher
_base_ = './im_r101_gflv2_r101_dcn_2x.py'
model = dict(
    pretrained='open-mmlab://resnext101_32x4d',
    backbone=dict(_delete_=True, type='ResNeXt', depth=101,
                  groups=32, base_width=4, frozen_stages=1,
                  norm_eval=True),
    teacher_config='configs/imv2/gflv2_r2n101_dcn_fpn_2x.py',
    teacher_ckpt='checkpoints/gflv2_r2n101_dcn_fpn_2x.ckpt')
