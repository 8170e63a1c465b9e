# Parity: /root/reference/configs/cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py
_base_ = './cascade_rcnn_r50_fpn_1x_coco.py'
model = dict(
    type='CascadeRCNN',
    roi_head=dict(
        mask_roi_extractor=dict(roi_layer=dict(output_size=14),
                                featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(num_convs=4, conv_out_channels=256)))
