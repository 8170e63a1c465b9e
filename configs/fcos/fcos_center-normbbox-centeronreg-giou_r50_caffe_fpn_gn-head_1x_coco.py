# Parity: /root/reference/configs/fcos/fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_gn-head_1x_coco.py
_base_ = './fcos_r50_caffe_fpn_gn-head_1x_coco.py'
model = dict(pretrained='open-mmlab://detectron2/resnet50_caffe')
model = dict(bbox_head=dict(
    norm_on_bbox=True, centerness_on_reg=True,
    dcn_on_last_conv=False, center_sampling=True, conv_bias=True,
    loss_bbox=dict(type='GIoULoss', loss_weight=1.0)))
test_cfg = dict(nms=dict(type='nms', iou_threshold=0.6))
optimizer_config = dict(_delete_=True, grad_clip=None)
lr_config = dict(warmup='linear')
