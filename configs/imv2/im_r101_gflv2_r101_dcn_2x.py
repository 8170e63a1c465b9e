# Parity: /root/reference/configs/imv2/im_r101_gflv2_r101_dcn_2x.py
_base_ = ['../ldv2/ld_r50_gflv2_r101_fpn_1x.py',
          '../_base_/mstrain_480_800.py']
model = dict(
    bbox_head=dict(type='IMv2Head',
                   loss_im=dict(type='IMLoss', loss_weight=2),
                   imitation_method='gibox'),
    pretrained='torchvision://resnet101',
    backbone=dict(depth=101),
    teacher_config='configs/imv2/gflv2_r101_dcn_fpn_2x.py',
    teacher_ckpt='checkpoints/gflv2_r101_dcn_fpn_2x.ckpt')
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
