# Parity: /root/reference/configs/fpg/faster_rcnn_r50_fpg-chn128_crop640_50e_coco.py
_base_ = './faster_rcnn_r50_fpg_crop640_50e_coco.py'
model = dict(
    neck=dict(out_channels=128),
    roi_head=dict(bbox_head=dict(in_channels=128), bbox_roi_extractor=dict(featmap_strides=[4, 8, 16, 32])))
