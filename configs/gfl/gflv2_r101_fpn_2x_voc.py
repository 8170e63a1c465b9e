# GFocalV2 R-101 2x on VOC — the LDv2 VOC teacher.
# Parity: /root/reference/configs/gfl/gflv2_r101_fpn_2x_voc.py. (That file
# sets num_classes=20 + an mstrain pipeline but never swaps its COCO _base_
# data for VOC — the VOC data wiring happened outside the config; here the
# VOC dataset base is wired in explicitly.)
_base_ = ['./gflv2_r101_fpn_2x_coco.py', '../_base_/datasets/voc0712.py']
model = dict(bbox_head=dict(num_classes=20))
# VOC trains at the (1000, 600) scale of its dataset base — drop the COCO
# mstrain batch_scales inherited from the 2x coco parent (they exceed the
# VOC pad buckets)
batch_scales = None
