# GFL R-50 multi-scale 2x, PER-IMAGE scale sampling — AP-parity twin of
# gfl_r50_fpn_mstrain_2x_coco.py. Exactly the reference's mstrain semantics
# (/root/reference/configs/gfl/gfl_r50_fpn_mstrain_2x_coco.py): each image
# draws its own short side from 480..800. Slower than the per-batch variant
# (most batches pay the max bucket); use it when validating AP against
# reference mstrain checkpoints.
_base_ = ['./gfl_r50_fpn_1x_coco.py', '../_base_/mstrain_480_800_perimage.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
