# LD on VOC: R-101 teacher -> R-18 student, 4 epochs
# (AP 53.0 / AP50 75.9 / AP75 57.6 vs 51.8 baseline).
# Parity: /root/reference/configs/ld/ld_r18_gflv1_r101_fpn_voc_1x.py.
_base_ = ['./ld_r18_gflv1_r101_fpn_coco_1x.py',
          '../_base_/datasets/voc0712.py']
teacher_ckpt = 'checkpoints/gfl_r101_voc.ckpt'
model = dict(
    teacher_config='configs/gfl/gfl_r101_fpn_voc.py',
    teacher_ckpt=teacher_ckpt,
    bbox_head=dict(num_classes=20))
lr_config = dict(step=[3], warmup_iters=500)
runner = dict(max_epochs=4)
optimizer = dict(lr=0.01)
