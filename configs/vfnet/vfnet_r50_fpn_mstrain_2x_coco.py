# Parity: /root/reference/configs/vfnet/vfnet_r50_fpn_mstrain_2x_coco.py
_base_ = ['./vfnet_r50_fpn_1x_coco.py', '../_base_/mstrain_480_960.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
