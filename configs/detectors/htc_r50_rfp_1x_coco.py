# Parity: /root/reference/configs/detectors/htc_r50_rfp_1x_coco.py
_base_ = './detectors_htc_r50_1x_coco.py'
# RFP only (no SAC)
model = dict(backbone=dict(sac=None,
                           stage_with_sac=(False, False, False,
                                           False)))
