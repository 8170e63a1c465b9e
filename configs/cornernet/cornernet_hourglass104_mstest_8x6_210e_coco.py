# Parity: /root/reference/configs/cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py
# mstest = multi-scale TTA at eval (tools/test.py --aug-test);
# train recipe identical to the 8x6 base
_base_ = './cornernet_hourglass104_8x6_210e_coco.py'
