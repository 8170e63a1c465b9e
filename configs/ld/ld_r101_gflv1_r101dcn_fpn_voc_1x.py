# LD on VOC: R-101-DCN teacher -> R-101 student, 4 epochs (val AP5095 58.4
# vs 57.6 baseline). Parity: /root/reference README.md:184 (published row,
# no shipped config; recipe mirrors ld_r18_gflv1_r101_fpn_voc_1x.py).
_base_ = ['./ld_r18_gflv1_r101_fpn_voc_1x.py']
teacher_ckpt = 'checkpoints/gfl_r101_dcn_voc.ckpt'
model = dict(
    pretrained='torchvision://resnet101',
    teacher_config='configs/gfl/gfl_r101_dcn_fpn_voc.py',
    teacher_ckpt=teacher_ckpt,
    backbone=dict(depth=101),
    neck=dict(in_channels=[256, 512, 1024, 2048]))
