# Self-LD: R-18 teacher -> R-18 student on COCO, 1x (val AP 36.1 vs 35.8
# baseline). Parity: /root/reference README.md:144 (self-LD R18 row);
# recipe mirrors the shipped R50 self-LD variant.
_base_ = ['./ld_r18_gflv1_r101_fpn_coco_1x.py']
teacher_ckpt = 'checkpoints/gfl_r18_fpn_1x_coco.ckpt'
model = dict(
    teacher_config='configs/gfl/gfl_r18_fpn_1x_coco.py',
    teacher_ckpt=teacher_ckpt)
