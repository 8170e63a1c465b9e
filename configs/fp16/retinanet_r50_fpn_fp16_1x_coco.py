# Parity: /root/reference/configs/fp16/retinanet_r50_fpn_fp16_1x_coco.py
# TPU-native: bfloat16 compute replaces fp16+loss-scale — bf16 has fp32's
# exponent range, so no loss scaling is needed (fp16_cfg is a no-op here).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
dtype = 'bfloat16'
