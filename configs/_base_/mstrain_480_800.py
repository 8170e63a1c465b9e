# Multi-scale training, short side 480..800. Reference form (e.g.
# configs/gfl/gfl_r101_fpn_mstrain_2x_coco.py): per-image Resize
# img_scale=[(1333, 480), (1333, 800)], multiscale_mode='range'.
#
# Default `scale_sampling='image_range_grouped'` (r5): the SAME per-image
# draw as the reference — every image draws its own short side ~
# randint(480, 800), identical marginal distribution, pinned by
# tests/test_data.py::test_grouped_mstrain_pure_reorder_guardrail — but
# the batch sampler groups same-pad-bucket images so each batch pads to
# its own bucket instead of the range max (the reference's aspect-ratio
# grouping reorder, group_sampler.py:10, applied to the scale axis).
# Expected 1.19x faster 2x epochs (93.1 vs 111.1 ms/step, docs/PERF.md);
# 3-seed miniature AP A/B measured CLEAN: grouped 0.5112 +- 0.012 vs
# per-image 0.5065 +- 0.031 (docs/EXPERIMENTS.md "Scale-grouped
# batching").
#
# Exact reference BATCHING semantics (ungrouped, max-bucket step cost):
# ./mstrain_480_800_perimage.py. The per-BATCH draw knob (~1.29x) in
# ./mstrain_480_800_perbatch.py measured AP-NEGATIVE and stays opt-in.
scale_sampling = 'image_range_grouped'
batch_scales = [(1333, 480), (1333, 544), (1333, 608), (1333, 672),
                (1333, 736), (1333, 800)]
pad_to = [(480, 1344), (544, 1344), (608, 1344), (672, 1344), (736, 1344),
          (800, 1344),
          (1344, 480), (1344, 544), (1344, 608), (1344, 672), (1344, 736),
          (1344, 800)]
