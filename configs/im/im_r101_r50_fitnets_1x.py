# Imitation ablation arm "FitNets" (val AP 40.7 vs 40.1 baseline).
# Parity: /root/reference README.md:158; the shipped reference code
# realizes this arm via imitation_method='fitnet' (anchors inside a GT
# box — mmdet/models/dense_heads/ld_head.py:580 get_im_region gt_flag).
_base_ = ['./im_r101_r50_coco_1x.py']
model = dict(bbox_head=dict(imitation_method='fitnet'))
