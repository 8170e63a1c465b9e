# Multi-scale training, short side 640..800 in /32 steps — the reference's
# value-mode mstrain (img_scale=[(1333,640)..(1333,800)],
# multiscale_mode='value', used by the *_caffe_fpn_mstrain_* family).
# Default `scale_sampling='image_value_grouped'` (r5, same decision as
# mstrain_480_800.py): reference per-image uniform grid pick,
# scale-grouped batch composition (pure reorder, AP-clean in the 3-seed
# A/B — docs/EXPERIMENTS.md). 'image_value' restores reference batching;
# 'batch' is the opt-in speed knob (AP-negative, see
# mstrain_480_800_perbatch.py).
scale_sampling = 'image_value_grouped'
batch_scales = [(1333, 640), (1333, 672), (1333, 704), (1333, 736),
                (1333, 768), (1333, 800)]
pad_to = [(640, 1344), (672, 1344), (704, 1344), (736, 1344), (768, 1344),
          (800, 1344),
          (1344, 640), (1344, 672), (1344, 704), (1344, 736), (1344, 768),
          (1344, 800)]
