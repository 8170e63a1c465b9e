# Parity: /root/reference/configs/centripetalnet/centripetalnet_hourglass104_mstest_16x6_210e_coco.py
_base_ = './centripetalnet_hourglass104_16x6_210e_coco.py'
