# Multi-scale training 480..800 with exact reference BATCHING semantics:
# per-image range draw, batches in aspect-group order only (each batch
# pads to its members' max bucket — the reference GroupSampler behavior).
# ./mstrain_480_800.py switched its default to 'image_range_grouped'
# (same per-image draw, scale-grouped batch composition, 1.19x cheaper
# epochs, AP-clean in the 3-seed A/B — docs/EXPERIMENTS.md); pin THIS
# base to reproduce the reference's batch composition exactly.
_base_ = './mstrain_480_800.py'
scale_sampling = 'image_range'
