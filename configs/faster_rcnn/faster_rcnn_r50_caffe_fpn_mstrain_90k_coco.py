# Parity: /root/reference/configs/faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_90k_coco.py
_base_ = './faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py'
# 90k-iteration budget; lr steps are in ITERS under IterBasedRunner
lr_config = dict(step=[60000, 80000])
runner = dict(_delete_=True, type='IterBasedRunner', max_iters=90000)
checkpoint_config = dict(interval=1)
