# Feature-imitation study: R-101 teacher -> R-18 student (GI imitation).
# Parity: /root/reference/configs/im/im_r101_r18_coco_1x.py.
_base_ = ['../ld/ld_r18_gflv1_r101_fpn_coco_1x.py']
model = dict(
    bbox_head=dict(
        type='IMHead',
        loss_im=dict(type='IMLoss', loss_weight=0.2),
        imitation_method='gibox'))
