# Parity: /root/reference/configs/reppoints/reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py
# head towers are GN-normalized natively (ConvGNBlock); this adds GN
# to the FPN laterals/outputs as in the reference gn-neck recipe
_base_ = './reppoints_moment_r50_fpn_1x_coco.py'
model = dict(neck=dict(norm_cfg=dict(
    type='GN', num_groups=32, requires_grad=True)))
