# Parity: /root/reference/configs/hrnet/fcos_hrnetv2p_w32_gn-head_mstrain_640-800_4x4_2x_coco.py
_base_ = ['./fcos_hrnetv2p_w32_gn-head_4x4_2x_coco.py',
          '../_base_/mstrain_640_800.py']
