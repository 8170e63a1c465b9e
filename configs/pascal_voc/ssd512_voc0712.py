# Parity: /root/reference/configs/pascal_voc/ssd512_voc0712.py
_base_ = './ssd300_voc0712.py'
model = dict(
    backbone=dict(input_size=512),
    bbox_head=dict(
        in_channels=(512, 1024, 512, 256, 256, 256, 256),
        anchor_generator=dict(
            input_size=512,
            basesize_ratio_range=(0.15, 0.9),
            strides=[8, 16, 32, 64, 128, 256, 512],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]])))
pad_to = [(512, 512)]
