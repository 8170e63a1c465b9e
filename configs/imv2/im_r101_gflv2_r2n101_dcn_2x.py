# Parity: /root/reference/configs/imv2/im_r101_gflv2_r2n101_dcn_2x.py
_base_ = './im_r101_gflv2_r101_dcn_2x.py'
model = dict(
    teacher_config='configs/imv2/gflv2_r2n101_dcn_fpn_2x.py',
    teacher_ckpt='checkpoints/gflv2_r2n101_dcn_fpn_2x.ckpt')
