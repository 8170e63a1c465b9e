# Imitation ablation arm "DeFeat" (val AP 40.8 vs 40.1 baseline).
# Parity: /root/reference README.md:161; imitation_method='decouple'
# (fg MSE + 2x bg MSE — the reference's decouple branch,
# mmdet/models/dense_heads/ld_head.py:177-183).
_base_ = ['./im_r101_r50_coco_1x.py']
model = dict(bbox_head=dict(imitation_method='decouple'))
