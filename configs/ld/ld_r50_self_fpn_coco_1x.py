# Self-LD: R-50 teacher -> R-50 student (val AP 40.6 vs 40.1).
# Parity: /root/reference/configs/ld (self-LD variants, README.md:146-147).
_base_ = ['./ld_r18_gflv1_r101_fpn_coco_1x.py']
teacher_ckpt = 'checkpoints/gfl_r50_fpn_1x_coco.ckpt'
model = dict(
    pretrained='torchvision://resnet50',
    teacher_config='configs/gfl/gfl_r50_fpn_1x_coco.py',
    teacher_ckpt=teacher_ckpt,
    backbone=dict(depth=50),
    neck=dict(in_channels=[256, 512, 1024, 2048]))
