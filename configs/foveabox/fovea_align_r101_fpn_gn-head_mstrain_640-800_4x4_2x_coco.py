# Parity: /root/reference/configs/foveabox/fovea_align_r101_fpn_gn-head_mstrain_640-800_4x4_2x_coco.py
_base_ = ['./fovea_align_r101_fpn_gn-head_4x4_2x_coco.py',
          '../_base_/mstrain_640_800.py']
