# Parity: /root/reference/configs/rpn/rpn_r101_fpn_2x_coco.py
_base_ = './rpn_r50_fpn_2x_coco.py'
model = dict(pretrained='torchvision://resnet101',
             backbone=dict(depth=101))
