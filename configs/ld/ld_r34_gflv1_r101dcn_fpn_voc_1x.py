# LD on VOC: R-101-DCN teacher -> R-34 student, 4 epochs (val AP5095 56.7
# vs 55.7 baseline). Parity: /root/reference README.md:182 (published row,
# no shipped config; recipe mirrors ld_r18_gflv1_r101_fpn_voc_1x.py).
_base_ = ['./ld_r18_gflv1_r101_fpn_voc_1x.py']
teacher_ckpt = 'checkpoints/gfl_r101_dcn_voc.ckpt'
model = dict(
    pretrained='torchvision://resnet34',
    teacher_config='configs/gfl/gfl_r101_dcn_fpn_voc.py',
    teacher_ckpt=teacher_ckpt,
    backbone=dict(depth=34))
