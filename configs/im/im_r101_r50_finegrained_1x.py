# Imitation ablation arm "Fine-Grained" (val AP 41.1 vs 40.1 baseline).
# Parity: /root/reference README.md:160; imitation_method='finegrained'
# (anchors with IoU > 0.5 * per-GT max — get_im_region assigned_fg,
# mmdet/models/dense_heads/ld_head.py:594-609).
_base_ = ['./im_r101_r50_coco_1x.py']
model = dict(bbox_head=dict(imitation_method='finegrained'))
