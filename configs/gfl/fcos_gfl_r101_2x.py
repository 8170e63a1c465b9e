# FCOS-GFL R-101 2x with center sampling — teacher for LD-FCOS.
# Parity: /root/reference/configs/gfl/fcos_gfl_r101_2x_center.py — caffe
# R-101, value-mode multi-scale (1333, 640|800), bias lr x2 / no bias decay.
_base_ = ['./fcos_gfl_r50_center.py']
model = dict(
    pretrained='open-mmlab://detectron/resnet101_caffe',
    backbone=dict(depth=101))
# value-mode multi-scale: each IMAGE picks one of the two scales
# (reference multiscale_mode='value'); static pad bucket per orientation
scale_sampling = 'image_value'
batch_scales = [(1333, 640), (1333, 800)]
pad_to = [(640, 1344), (800, 1344), (1344, 640), (1344, 800)]
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
optimizer = dict(
    type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001,
    paramwise_cfg=dict(bias_lr_mult=2.0, bias_decay_mult=0.0))
