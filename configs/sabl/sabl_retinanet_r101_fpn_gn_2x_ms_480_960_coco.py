# Parity: /root/reference/configs/sabl/sabl_retinanet_r101_fpn_gn_2x_ms_480_960_coco.py
_base_ = ['./sabl_retinanet_r101_fpn_gn_1x_coco.py',
          '../_base_/mstrain_480_960.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
