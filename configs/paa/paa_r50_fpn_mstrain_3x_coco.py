# Parity: /root/reference/configs/paa/paa_r50_fpn_mstrain_3x_coco.py
_base_ = ['./paa_r50_fpn_1x_coco.py', '../_base_/mstrain_640_800.py']
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
