# GFL R-50 multi-scale 2x (val AP 42.9 in the GFL paper).
# Parity: /root/reference/configs/gfl/gfl_r50_fpn_mstrain_2x_coco.py —
# per-image range-mode scale draw (1333, 480..800), exactly as the
# reference (configs/_base_/mstrain_480_800.py; per-batch speed knob via
# ../_base_/mstrain_480_800_perbatch.py).
_base_ = ['./gfl_r50_fpn_1x_coco.py', '../_base_/mstrain_480_800.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
