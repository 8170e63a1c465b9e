# GFL R-101 VOC teacher. Parity: reference VOC teacher config.
_base_ = ['./gfl_r101_fpn_mstrain_2x_coco.py',
          '../_base_/datasets/voc0712.py']
model = dict(bbox_head=dict(num_classes=20))
# VOC trains at its dataset base's (1000, 600) scale — drop the COCO
# mstrain batch_scales inherited from the 2x parent (they exceed the VOC
# pad buckets)
batch_scales = None
lr_config = dict(step=[3])
runner = dict(max_epochs=4)
