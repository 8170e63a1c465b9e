# Multi-scale training, short side 480..960 (the VFNet / SABL-ms recipe:
# range-mode Resize img_scale=[(1333,480),(1333,960)]).
# Default `scale_sampling='image_range_grouped'` (r5, same decision as
# mstrain_480_800.py): reference per-image draw ~ randint(480, 960),
# scale-grouped batch composition (pure reorder, AP-clean in the 3-seed
# A/B — docs/EXPERIMENTS.md). 'image_range' restores reference batching;
# 'batch' is the opt-in speed knob (AP-negative, see
# mstrain_480_800_perbatch.py).
scale_sampling = 'image_range_grouped'
batch_scales = [(1333, 480), (1333, 576), (1333, 672), (1333, 768),
                (1333, 864), (1333, 960)]
pad_to = [(480, 1344), (576, 1344), (672, 1344), (768, 1344), (864, 1344),
          (960, 1344),
          (1344, 480), (1344, 576), (1344, 672), (1344, 768), (1344, 864),
          (1344, 960)]
