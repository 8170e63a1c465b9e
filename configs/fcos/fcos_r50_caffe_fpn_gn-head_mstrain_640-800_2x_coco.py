# Parity: /root/reference/configs/fcos/fcos_r50_caffe_fpn_gn-head_mstrain_640-800_2x_coco.py
_base_ = ['./fcos_r50_caffe_fpn_gn-head_1x_coco.py',
          '../_base_/mstrain_640_800.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
