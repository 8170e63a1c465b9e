# Multi-scale training, short side 480..800. Reference form (e.g.
# configs/gfl/gfl_r101_fpn_mstrain_2x_coco.py): per-image Resize
# img_scale=[(1333, 480), (1333, 800)], multiscale_mode='range'.
#
# Default `scale_sampling='image_range'` keeps EXACT reference semantics:
# every image draws its own short side ~ randint(480, 800) inside the
# pipeline's Resize (loader.py re-arms the sampler with the endpoints
# below). Batches pad to the smallest fitting static bucket; with
# per-image draws most batches contain a near-800 image, so expect
# max-bucket step cost.
#
# The per-BATCH sampling speed knob (~1.29x faster epochs) lives in
# ./mstrain_480_800_perbatch.py — it measured AP-NEGATIVE at miniature
# scale (docs/EXPERIMENTS.md mstrain A/B), so it is opt-in only.
scale_sampling = 'image_range'
batch_scales = [(1333, 480), (1333, 544), (1333, 608), (1333, 672),
                (1333, 736), (1333, 800)]
pad_to = [(480, 1344), (544, 1344), (608, 1344), (672, 1344), (736, 1344),
          (800, 1344),
          (1344, 480), (1344, 544), (1344, 608), (1344, 672), (1344, 736),
          (1344, 800)]
