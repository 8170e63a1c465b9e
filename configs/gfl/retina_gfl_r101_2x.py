# Retina-GFL R-101 (the reference ships this sibling of
# retinagfl_r101_2x_coco with a 1x schedule and NMS IoU 0.5 — despite the
# "2x" name; both quirks mirrored).
# Parity: /root/reference/configs/gfl/retina_gfl_r101_2x.py.
_base_ = ['./retinagfl_r101_2x_coco.py']
model = dict(test_cfg=dict(nms=dict(type='nms', iou_threshold=0.5)))
lr_config = dict(step=[8, 11])
runner = dict(max_epochs=12)
