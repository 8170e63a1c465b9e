# Parity: /root/reference/configs/foveabox/fovea_align_r101_fpn_gn-head_4x4_2x_coco.py
_base_ = './fovea_r101_fpn_4x4_1x_coco.py'
model = dict(
    bbox_head=dict(with_deform=True,
                   norm_cfg=dict(type='GN', num_groups=32,
                                 requires_grad=True)))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
