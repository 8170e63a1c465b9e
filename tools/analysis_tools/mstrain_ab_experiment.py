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
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

if '--cpu' in sys.argv:
    from ld_tpu.utils.platform import force_cpu
    force_cpu()

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


def _pipeline(arm: str):
    if arm == 'per_image':
        resize = dict(type='Resize', img_scale=[SCALES[0], SCALES[-1]],
                      multiscale_mode='range', keep_ratio=True)
    else:
        # fixed transform; the DataLoader injects the drawn scale via the
        # thread-local override (per-batch or per-image+grouped modes)
        resize = dict(type='Resize', img_scale=SCALES[-1], keep_ratio=True)
    return [resize, NORM, dict(type='Pad', size_divisor=32),
            dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])]


def _cfg(arm: str, seed: int, epochs: int):
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
    if arm == 'per_image':
        # every batch can contain a near-max image -> one max bucket
        cfg['pad_to'] = (160, 224)
        cfg['batch_scales'] = None
    elif arm == 'per_batch':
        cfg['pad_to'] = [(128, 160), (160, 192), (160, 224)]
        cfg['batch_scales'] = SCALES
        cfg['scale_sampling'] = 'batch'  # the r3-measured AP-negative knob
    else:  # 'grouped': per-image draw, scale-grouped batching (r4)
        cfg['pad_to'] = [(128, 160), (160, 192), (160, 224)]
        cfg['batch_scales'] = SCALES
        cfg['scale_sampling'] = 'image_range_grouped'
    return cfg


def _run(arm: str, seed: int, epochs: int, work: str):
    train = SyntheticDetectionDataset(
        num_images=96, hw=HW, num_classes=NUM_CLASSES, max_boxes=4,
        pipeline=_pipeline(arm), seed=0, draw_boxes=True)
    val = SyntheticDetectionDataset(
        num_images=48, hw=HW, num_classes=NUM_CLASSES, max_boxes=4,
        pipeline=[NORM, dict(type='Pad', size_divisor=32),
                  dict(type='Collect', keys=['img'])],
        seed=1, draw_boxes=True)
    out = train_detector(_cfg(arm, seed, epochs), work, dataset=train)
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
    ap.add_argument('--arms', nargs='+',
                    default=['per_image', 'grouped'],
                    choices=['per_image', 'per_batch', 'grouped'],
                    help="arms to run; 'grouped' = per-image draw + "
                         "scale-grouped batching (the r4 default "
                         "candidate), 'per_batch' = the r3-retired knob")
    ap.add_argument('--cpu', action='store_true',
                    help='force the host CPU platform (handled pre-import)')
    args = ap.parse_args()

    results = {arm: [] for arm in args.arms}
    for seed in range(args.seeds):
        for name in args.arms:
            ap_val = _run(name, seed, args.epochs,
                          f'/tmp/mstrain_ab/{name}_s{seed}')
            results[name].append(round(ap_val, 4))
            print(f'{name} seed {seed}: mAP {ap_val:.4f}', flush=True)

    summary = dict(scales=SCALES, seeds=args.seeds, epochs=args.epochs)
    for name, vals in results.items():
        v = np.array(vals)
        summary[name] = vals
        summary[f'{name}_mean'] = round(float(v.mean()), 4)
        summary[f'{name}_std'] = round(float(v.std()), 4)
    base = args.arms[0]
    for name in args.arms[1:]:
        summary[f'delta_{name}_vs_{base}'] = round(
            summary[f'{name}_mean'] - summary[f'{base}_mean'], 4)
    print(json.dumps(summary, indent=2))
    with open(args.out, 'w') as f:
        json.dump(summary, f, indent=2)


if __name__ == '__main__':
    main()
