# Multi-scale training, short side 480..960 (the VFNet / SABL-ms recipe:
# range-mode Resize img_scale=[(1333,480),(1333,960)]).
# Default `scale_sampling='image_range'`: every image draws its own short
# side ~ randint(480, 960) inside the pipeline's Resize — exact reference
# semantics. Per-BATCH sampling (scale_sampling='batch') is the opt-in
# speed knob; see mstrain_480_800_perbatch.py for the A/B caveat.
scale_sampling = 'image_range'
batch_scales = [(1333, 480), (1333, 576), (1333, 672), (1333, 768),
                (1333, 864), (1333, 960)]
pad_to = [(480, 1344), (576, 1344), (672, 1344), (768, 1344), (864, 1344),
          (960, 1344),
          (1344, 480), (1344, 576), (1344, 672), (1344, 768), (1344, 864),
          (1344, 960)]
