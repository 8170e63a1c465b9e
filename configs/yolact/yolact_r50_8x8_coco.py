# Parity: /root/reference/configs/yolact/yolact_r50_8x8_coco.py
_base_ = './yolact_r50_1x8_coco.py'
# 8-GPU recipe: 8x batch, linearly scaled lr, scaled warmup
optimizer = dict(lr=8e-3)
lr_config = dict(warmup_iters=1000)
data = dict(samples_per_gpu=8)
