# Parity: /root/reference/configs/guided_anchoring/ga_retinanet_r101_caffe_fpn_mstrain_2x.py
_base_ = ['./ga_retinanet_r101_caffe_fpn_1x_coco.py',
          '../_base_/mstrain_480_960.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
