# Parity: /root/reference/configs/gfl/fcos_gfl_r101_2x_center.py
_base_ = ['./fcos_gfl_r50_center.py', '../_base_/mstrain_640_800.py']
model = dict(pretrained='open-mmlab://detectron/resnet101_caffe',
             backbone=dict(depth=101))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
optimizer = dict(lr=0.01,
                 paramwise_cfg=dict(bias_lr_mult=2.0,
                                    bias_decay_mult=0.0))
