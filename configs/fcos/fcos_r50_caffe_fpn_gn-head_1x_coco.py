# Parity: /root/reference/configs/fcos/fcos_r50_caffe_fpn_gn-head_1x_coco.py
_base_ = ['./fcos_r50_fpn_1x_coco.py',
          '../_base_/detectron_norm_detection.py']
model = dict(
    pretrained='open-mmlab://detectron/resnet50_caffe',
    backbone=dict(norm_cfg=dict(type='BN', requires_grad=False),
                  style='caffe'),
    neck=dict(relu_before_extra_convs=True))
# FCOS recipe: constant 1/3 warmup, grad-clip 35, 2x bias lr
optimizer = dict(lr=0.01,
                 paramwise_cfg=dict(bias_lr_mult=2.,
                                    bias_decay_mult=0.))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(warmup='constant', warmup_ratio=1.0 / 3)
