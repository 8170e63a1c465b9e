# Tiny synthetic-data config for e2e smoke training without COCO on disk.
_base_ = ['../gfl/gfl_r18_fpn_1x_coco.py']
pad_to = (160, 224)
max_gts_per_image = 8
data = dict(
    samples_per_gpu=2,
    train=dict(_delete_=True, type='SyntheticDetectionDataset', num_images=16,
               hw=(160, 224),
               pipeline=[
                   dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                        std=[58.395, 57.12, 57.375], to_rgb=True),
                   dict(type='Pad', size_divisor=32),
                   dict(type='Collect',
                        keys=['img', 'gt_bboxes', 'gt_labels']),
               ]),
    val=dict(_delete_=True, type='SyntheticDetectionDataset', num_images=8,
             hw=(160, 224),
             pipeline=[
                 dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                      std=[58.395, 57.12, 57.375], to_rgb=True),
                 dict(type='Pad', size_divisor=32),
                 dict(type='Collect', keys=['img']),
             ]),
    test=dict(_delete_=True, type='SyntheticDetectionDataset', num_images=8,
              hw=(160, 224),
              pipeline=[
                  dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                       std=[58.395, 57.12, 57.375], to_rgb=True),
                  dict(type='Pad', size_divisor=32),
                  dict(type='Collect', keys=['img']),
              ]))
log_config = dict(interval=2)
runner = dict(max_epochs=1)
lr_config = dict(warmup_iters=4, step=[1])
