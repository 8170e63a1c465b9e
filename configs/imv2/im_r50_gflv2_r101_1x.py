# Feature-imitation study on GFocalV2: R-101 teacher -> R-50 student.
# Parity: /root/reference/configs/imv2/im_r50_gflv2_r101_1x.py.
_base_ = ['../ldv2/ld_r50_gflv2_r101_fpn_1x.py']
model = dict(
    bbox_head=dict(
        type='IMv2Head',
        loss_im=dict(type='IMLoss', loss_weight=2),
        imitation_method='gibox'))
