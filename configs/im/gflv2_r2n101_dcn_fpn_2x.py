# Parity: /root/reference/configs/im/gflv2_r2n101_dcn_fpn_2x.py
_base_ = '../imv2/gflv2_r2n101_dcn_fpn_2x.py'
