# GFL R-50 on VOC 07+12, 4 epochs (val AP5095 55.8 — the VOC R50 baseline
# and the student init for the R101->R50 VOC LD row).
# Parity: /root/reference README.md:179 (the reference publishes the row
# but ships no config; recipe mirrors its shipped gfl_r18_fpn1x_voc.py).
_base_ = ['./gfl_r50_fpn_1x_coco.py', '../_base_/datasets/voc0712.py']
model = dict(bbox_head=dict(num_classes=20))
optimizer = dict(lr=0.00375)
lr_config = dict(step=[3])
runner = dict(max_epochs=4)
data = dict(samples_per_gpu=3)
