# GFL R-18 on VOC 07+12 (the self-LD VOC baseline/teacher).
# Parity: /root/reference/configs/gfl/gfl_r18_fpn1x_voc.py — RepeatDataset
# x3 over trainval, samples_per_gpu=3, lr 0.00375, step [3], 4 epochs.
_base_ = ['./gfl_r18_fpn_1x_coco.py', '../_base_/datasets/voc0712.py']
model = dict(bbox_head=dict(num_classes=20))
optimizer = dict(lr=0.00375)
lr_config = dict(step=[3])
runner = dict(max_epochs=4)
data = dict(samples_per_gpu=3)
