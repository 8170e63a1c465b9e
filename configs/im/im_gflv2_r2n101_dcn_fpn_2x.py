# Parity: /root/reference/configs/im/im_gflv2_r2n101_dcn_fpn_2x.py
_base_ = '../imv2/im_r101_gflv2_r2n101_dcn_2x.py'
