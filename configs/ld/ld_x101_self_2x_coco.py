# Self-LD: X-101-32x4d -> X-101-32x4d (val AP 47.5 vs 46.9 with DCN teacher;
# plain-conv variant here — DCN backbones land with the deform-conv kernel).
# Parity: /root/reference README.md:148-149 self-LD X101 row.
_base_ = ['./ld_r18_gflv1_r101_fpn_coco_1x.py']
teacher_ckpt = 'checkpoints/gfl_x101_2x_coco.ckpt'
model = dict(
    pretrained='torchvision://resnext101_32x4d',
    teacher_config='configs/gfl/gfl_x101_fpn_2x_coco.py',
    teacher_ckpt=teacher_ckpt,
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
        style='pytorch'),
    neck=dict(in_channels=[256, 512, 1024, 2048]))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
