#!/usr/bin/env python
"""Per-IMAGE vs per-BATCH multi-scale sampling A/B (VERDICT r02 Next #8).

The reference's mstrain draws a resize scale per IMAGE
(/root/reference/mmdet/datasets/pipelines/transforms.py:119-186
`random_sample`); the TPU-native default base (configs/_base_/
mstrain_480_800.py) draws one scale per BATCH so small-scale batches run
in small static pad buckets (~1.29x faster epochs, docs/PERF.md). This
experiment bounds the AP cost of that deviation at miniature scale:
same drawable synthetic task, same model/schedule, N seeds per variant,
val AP measured at a fixed scale.

Usage:
    python tools/analysis_tools/mstrain_ab_experiment.py \
        [--seeds 3] [--epochs 24] [--out mstrain_ab.json]
"""
import argparse
import json
import os
import sys

# the environment's sitecustomize exports JAX_PLATFORMS=axon (TPU tunnel),
# clobbering any shell-level JAX_PLATFORMS=cpu; honor an explicit --cpu
# BEFORE jax is imported (miniature A/B runs fine on host CPU and leaves
# the chip free)
if '--cpu' in sys.argv:
    os.environ['JAX_PLATFORMS'] = 'cpu'

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

from ld_tpu.utils.profiling import setup_jax_cache  # noqa: E402

setup_jax_cache()

import numpy as np

from ld_tpu import Config
from ld_tpu.apis import eval_detector
from ld_tpu.apis.train import train_detector
from ld_tpu.data import SyntheticDetectionDataset

HW = (160, 224)
NUM_CLASSES = 4
NORM = dict(type='Normalize', mean=[123.675, 116.28, 103.53],
            std=[58.395, 57.12, 57.375], to_rgb=True)
# short side 112..160 (70%..100%), long side capped at 224 — the miniature
# analogue of the reference's (1333, 480..800)
SCALES = [(224, 112), (224, 136), (224, 160)]


def _pipeline(per_image: bool):
    if per_image:
        resize = dict(type='Resize', img_scale=[SCALES[0], SCALES[-1]],
                      multiscale_mode='range', keep_ratio=True)
    else:
        # fixed transform; the DataLoader's batch_scales override samples
        # the actual scale once per batch (transforms.py Resize.batch_scale)
        resize = dict(type='Resize', img_scale=SCALES[-1], keep_ratio=True)
    return [resize, NORM, dict(type='Pad', size_divisor=32),
            dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])]


def _cfg(per_image: bool, seed: int, epochs: int):
    cfg = Config.fromfile(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '..', '..',
        'configs/synthetic/gfl_r18_synthetic.py'))
    cfg['seed'] = seed
    cfg['model']['bbox_head'].update(num_classes=NUM_CLASSES,
                                     stacked_convs=1, feat_channels=64)
    cfg['model']['pretrained'] = None
    cfg['runner'] = dict(max_epochs=epochs)
    cfg['optimizer'] = dict(type='SGD', lr=0.01, momentum=0.9,
                            weight_decay=1e-4)
    cfg['lr_config'] = dict(warmup_iters=50,
                            step=[int(epochs * 0.75), int(epochs * 0.92)])
    cfg['evaluation'] = dict(interval=0)
    cfg['checkpoint_config'] = dict(interval=10**9)
    cfg['log_config'] = dict(interval=100)
    cfg['max_gts_per_image'] = 8
    cfg.data['samples_per_gpu'] = 8
    if per_image:
        # every batch can contain a near-max image -> one max bucket
        cfg['pad_to'] = (160, 224)
        cfg['batch_scales'] = None
    else:
        cfg['pad_to'] = [(128, 160), (160, 192), (160, 224)]
        cfg['batch_scales'] = SCALES
        cfg['scale_sampling'] = 'batch'  # the deviation under test
    return cfg


def _run(per_image: bool, seed: int, epochs: int, work: str):
    train = SyntheticDetectionDataset(
        num_images=96, hw=HW, num_classes=NUM_CLASSES, max_boxes=4,
        pipeline=_pipeline(per_image), seed=0, draw_boxes=True)
    val = SyntheticDetectionDataset(
        num_images=48, hw=HW, num_classes=NUM_CLASSES, max_boxes=4,
        pipeline=[NORM, dict(type='Pad', size_divisor=32),
                  dict(type='Collect', keys=['img'])],
        seed=1, draw_boxes=True)
    out = train_detector(_cfg(per_image, seed, epochs), work, dataset=train)
    variables = {'params': out['state'].params,
                 'batch_stats': out['state'].batch_stats}
    res = eval_detector(out['detector'], variables, val, pad_hw=HW,
                        mesh=out['mesh'])
    return float(val.evaluate(res)['bbox_mAP'])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', type=int, default=3)
    ap.add_argument('--epochs', type=int, default=24)
    ap.add_argument('--out', default='mstrain_ab.json')
    ap.add_argument('--cpu', action='store_true',
                    help='force the host CPU platform (handled pre-import)')
    args = ap.parse_args()

    results = {'per_image': [], 'per_batch': []}
    for seed in range(args.seeds):
        for name, per_image in (('per_image', True), ('per_batch', False)):
            ap_val = _run(per_image, seed, args.epochs,
                          f'/tmp/mstrain_ab/{name}_s{seed}')
            results[name].append(round(ap_val, 4))
            print(f'{name} seed {seed}: mAP {ap_val:.4f}', flush=True)

    a = np.array(results['per_image'])
    b = np.array(results['per_batch'])
    summary = dict(
        scales=SCALES, seeds=args.seeds, epochs=args.epochs,
        per_image=results['per_image'], per_batch=results['per_batch'],
        per_image_mean=round(float(a.mean()), 4),
        per_image_std=round(float(a.std()), 4),
        per_batch_mean=round(float(b.mean()), 4),
        per_batch_std=round(float(b.std()), 4),
        delta_mean=round(float(b.mean() - a.mean()), 4))
    print(json.dumps(summary, indent=2))
    with open(args.out, 'w') as f:
        json.dump(summary, f, indent=2)


if __name__ == '__main__':
    main()
