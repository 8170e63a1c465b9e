# Self-LD on VOC: R-18 teacher (VOC-trained GFL) -> R-18 student, 12 epochs
# over 3x-repeated 07+12 trainval.
# Parity: /root/reference/configs/ld/ld_r18_self_2x_3x_voc.py. (Its
# teacher_config names configs/gfl/gfl_r18_fpn4x_voc.py, which the
# reference never ships — the shipped VOC r18 teacher config is
# gfl_r18_fpn1x_voc; pointed there.)
_base_ = ['./ld_r18_gflv1_r101_fpn_voc_1x.py']
teacher_ckpt = 'checkpoints/r18_voc2x.ckpt'
model = dict(
    teacher_config='configs/gfl/gfl_r18_fpn1x_voc.py',
    teacher_ckpt=teacher_ckpt)
optimizer = dict(lr=0.00375)
lr_config = dict(step=[9], warmup_iters=500)
runner = dict(max_epochs=12)
data = dict(samples_per_gpu=3)
