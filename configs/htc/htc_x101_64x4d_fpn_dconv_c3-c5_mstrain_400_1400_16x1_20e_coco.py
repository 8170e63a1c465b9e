# Parity: /root/reference/configs/htc/htc_x101_64x4d_fpn_dconv_c3-c5_mstrain_400_1400_16x1_20e_coco.py
_base_ = './htc_x101_64x4d_fpn_16x1_20e_coco.py'
model = dict(backbone=dict(
    dcn=dict(type='DCNv2', deform_groups=1,
             fallback_on_stride=False),
    stage_with_dcn=(False, True, True, True)))
# reference: range-mode (1600, 400..1400); per-image draw between the
# endpoint scales (loader default scale_sampling='image_range'); the
# /32 grid below doubles as the opt-in per-batch mode and bucket list
batch_scales = [(1600, 400), (1600, 608), (1600, 800), (1600, 1024),
                (1600, 1216), (1600, 1400)]
pad_to = [(416, 1600), (608, 1600), (800, 1600), (1024, 1600),
          (1216, 1600), (1408, 1600),
          (1600, 416), (1600, 608), (1600, 800), (1600, 1024),
          (1600, 1216), (1600, 1408)]
