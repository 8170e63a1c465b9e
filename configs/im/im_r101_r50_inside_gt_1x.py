# Imitation ablation arm "Inside GT Box" (val AP 40.7 vs 40.1 baseline).
# Parity: /root/reference README.md:159. The shipped reference code maps
# both this arm and FitNets to the same inside-GT region mask
# (get_im_region mode='fitnet' returns gt_flag,
# mmdet/models/dense_heads/ld_head.py:608-611); the rows differ only in
# the paper's training details, so this config mirrors that mapping.
_base_ = ['./im_r101_r50_coco_1x.py']
model = dict(bbox_head=dict(imitation_method='fitnet'))
