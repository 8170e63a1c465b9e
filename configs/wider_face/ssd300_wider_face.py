# Parity: /root/reference/configs/wider_face/ssd300_wider_face.py
_base_ = [
    '../ssd/ssd300_coco.py',
    '../_base_/datasets/wider_face.py',
    '../_base_/default_runtime.py',
]
model = dict(bbox_head=dict(num_classes=1))
optimizer = dict(type='SGD', lr=0.012, momentum=0.9, weight_decay=5e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', warmup='linear', warmup_iters=1000,
                 warmup_ratio=0.001, step=[16, 20])
runner = dict(type='EpochBasedRunner', max_epochs=24)
