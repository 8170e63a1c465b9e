# Parity: /root/reference/configs/_base_/models/cascade_mask_rcnn_r50_fpn.py
_base_ = './cascade_rcnn_r50_fpn.py'
model = dict(
    roi_head=dict(
        mask_roi_extractor=dict(roi_layer=dict(output_size=14),
                                featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(num_convs=4, conv_out_channels=256,
                       num_classes=80)))
