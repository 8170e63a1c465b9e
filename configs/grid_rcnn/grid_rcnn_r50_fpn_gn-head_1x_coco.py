# Parity: /root/reference/configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_1x_coco.py
# (1x variant of the 2x grid r-cnn recipe)
_base_ = './grid_rcnn_r50_fpn_gn-head_2x_coco.py'
lr_config = dict(step=[8, 11])
total_epochs = 12
