# Parity: /root/reference/configs/im/im_r50_gflv2_r101_1x.py
_base_ = '../imv2/im_r50_gflv2_r101_1x.py'
