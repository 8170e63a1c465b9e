# LD: R-101-DCN teacher -> R-101 student, 2x (val AP 45.4 vs 44.6 baseline).
# Parity: /root/reference/configs/ld/ld_r101_gflv1_r101dcn_fpn_coco_2x.py.
_base_ = ['./ld_r18_gflv1_r101_fpn_coco_1x.py',
          '../_base_/mstrain_480_800.py']
teacher_ckpt = 'checkpoints/gfl_r101_dcn_fpn_mstrain_2x_coco.ckpt'
model = dict(
    pretrained='torchvision://resnet101',
    teacher_config='configs/gfl/gfl_r101_dcn_fpn_mstrain_2x_coco.py',
    teacher_ckpt=teacher_ckpt,
    backbone=dict(depth=101),
    neck=dict(in_channels=[256, 512, 1024, 2048]))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
