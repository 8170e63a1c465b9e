# LD main KD + LD + VLR LD plus GI feature imitation — the "+GI" rows of
# the reference's pretrained-weights table (/root/reference/README.md:255,
# R101->R50 val AP 42.4 vs 42.1 without GI; GI region construction at
# /root/reference/mmdet/models/dense_heads/ld_head.py:613-638).
_base_ = './ld_r50_gflv1_r101_fpn_coco_1x.py'
model = dict(
    bbox_head=dict(
        loss_im=dict(type='IMLoss', loss_weight=2),
        imitation_method='gibox'))
