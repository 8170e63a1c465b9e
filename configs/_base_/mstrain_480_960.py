# Multi-scale training, short side 480..960 (the VFNet / SABL-ms recipe:
# range-mode Resize img_scale=[(1333,480),(1333,960)]). TPU-native form:
# per-batch scales over static pad buckets (see mstrain_480_800.py).
batch_scales = [(1333, 480), (1333, 576), (1333, 672), (1333, 768),
                (1333, 864), (1333, 960)]
pad_to = [(480, 1344), (576, 1344), (672, 1344), (768, 1344), (864, 1344),
          (960, 1344),
          (1344, 480), (1344, 576), (1344, 672), (1344, 768), (1344, 864),
          (1344, 960)]
