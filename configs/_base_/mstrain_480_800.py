# Multi-scale training, short side 480..800. Reference form (e.g.
# configs/gfl/gfl_r101_fpn_mstrain_2x_coco.py): per-image Resize
# img_scale=[(1333, 480), (1333, 800)], multiscale_mode='range'.
# TPU-native form: one scale per BATCH (loader.py batch_scales) sampled
# from a /32-aligned grid, so each batch is padded to its own static
# bucket instead of every batch paying 800-scale conv FLOPs; pad_to lists
# one bucket per (scale, orientation).
batch_scales = [(1333, 480), (1333, 544), (1333, 608), (1333, 672),
                (1333, 736), (1333, 800)]
pad_to = [(480, 1344), (544, 1344), (608, 1344), (672, 1344), (736, 1344),
          (800, 1344),
          (1344, 480), (1344, 544), (1344, 608), (1344, 672), (1344, 736),
          (1344, 800)]
