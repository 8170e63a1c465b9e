# GFL X-101-32x4d 2x.
_base_ = ['./gfl_r50_fpn_1x_coco.py', '../_base_/mstrain_480_800.py']
model = dict(
    pretrained='torchvision://resnext101_32x4d',
    backbone=dict(
        _delete_=True,
        type='ResNeXt',
        depth=101,
        groups=32,
        base_width=4,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        style='pytorch'))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
