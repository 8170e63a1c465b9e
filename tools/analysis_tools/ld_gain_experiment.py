#!/usr/bin/env python
"""End-to-end LD sanity experiment on drawable synthetic data.

The reference publishes LD's +2.0 AP on COCO but ships no train-to-AP test
(SURVEY.md §4 'NOT tested'). This runs the WHOLE distillation pipeline at
miniature scale — teacher training, teacher export, KD student training,
COCO-protocol eval on a held-out split — and reports baseline-student vs
LD-student AP. Synthetic objects are class-colored rectangles
(SyntheticDetectionDataset draw_boxes=True), so the task generalizes and a
stronger teacher has real knowledge to transfer.

Usage: python tools/analysis_tools/ld_gain_experiment.py [--out results.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import jax

from ld_tpu.utils.profiling import setup_jax_cache  # noqa: E402

setup_jax_cache()

import numpy as np

from ld_tpu import Config
from ld_tpu.apis import eval_detector
from ld_tpu.apis.train import train_detector
from ld_tpu.data import SyntheticDetectionDataset
from ld_tpu.utils.checkpoint import save_variables

HW = (160, 224)
NUM_CLASSES = 4
PIPE = [
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]


def datasets():
    train = SyntheticDetectionDataset(num_images=96, hw=HW,
                                      num_classes=NUM_CLASSES, max_boxes=4,
                                      pipeline=PIPE, seed=0, draw_boxes=True)
    val = SyntheticDetectionDataset(num_images=32, hw=HW,
                                    num_classes=NUM_CLASSES, max_boxes=4,
                                    pipeline=PIPE, seed=1, draw_boxes=True)
    return train, val


def base_cfg(epochs, lr=0.01):
    cfg = Config.fromfile(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '..', '..',
        'configs/synthetic/gfl_r18_synthetic.py'))
    cfg['model']['bbox_head']['num_classes'] = NUM_CLASSES
    cfg['model']['pretrained'] = None
    cfg['runner'] = dict(max_epochs=epochs)
    cfg['optimizer'] = dict(type='SGD', lr=lr, momentum=0.9,
                            weight_decay=1e-4)
    cfg['lr_config'] = dict(warmup_iters=50,
                            step=[int(epochs * 0.75), int(epochs * 0.92)])
    cfg['evaluation'] = dict(interval=0)
    cfg['checkpoint_config'] = dict(interval=10**9)
    cfg['log_config'] = dict(interval=50)
    return cfg


def evaluate(out, val):
    variables = {'params': out['state'].params,
                 'batch_stats': out['state'].batch_stats}
    res = eval_detector(out['detector'], variables, val,
                        pad_hw=HW, mesh=out['mesh'])
    return {k: float(v) for k, v in val.evaluate(res).items()
            if isinstance(v, (int, float))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='ld_gain.json')
    ap.add_argument('--teacher-epochs', type=int, default=60)
    ap.add_argument('--student-epochs', type=int, default=16)
    args = ap.parse_args()
    train, val = datasets()
    work = '/tmp/ld_gain'

    # 1. teacher: full GFL-R18 head, long schedule
    tcfg = base_cfg(args.teacher_epochs)
    t_out = train_detector(tcfg, f'{work}/teacher', dataset=train)
    t_ap = evaluate(t_out, val)
    print('TEACHER:', t_ap)
    save_variables(f'{work}/teacher.npz',
                   {'params': t_out['state'].params,
                    'batch_stats': t_out['state'].batch_stats})

    # 2. baseline student: thin head (stacked_convs 1, 64ch), short schedule
    def student_cfg():
        cfg = base_cfg(args.student_epochs)
        cfg['model']['bbox_head'].update(stacked_convs=1, feat_channels=64)
        return cfg

    b_out = train_detector(student_cfg(), f'{work}/student_base',
                           dataset=train)
    b_ap = evaluate(b_out, val)
    print('BASELINE STUDENT:', b_ap)

    # 3. LD student: same student, + main-region LD + VLR LD + cls KD
    lcfg = student_cfg()
    model = lcfg['model']
    model['type'] = 'KnowledgeDistillationSingleStageDetector'
    model['teacher_config'] = dict(model=dict(tcfg['model']))
    model['teacher_ckpt'] = f'{work}/teacher.npz'
    model['bbox_head'].update(
        type='LDHead',
        loss_ld=dict(type='KnowledgeDistillationKLDivLoss',
                     loss_weight=0.25, T=10),
        loss_ld_vlr=dict(type='KnowledgeDistillationKLDivLoss',
                         loss_weight=0.25, T=10),
        # cls-KD weight 1 here, NOT the reference's COCO weight 10: with
        # only 4 classes the softmax-KD objective is ~20x stronger per
        # class than on 80-class COCO and weight 10 collapses the sigmoid
        # scoring (measured: mAP 0.0001; weight 1 -> no collapse). See
        # docs/EXPERIMENTS.md for the full sweep.
        loss_kd=dict(type='KnowledgeDistillationKLDivLoss',
                     loss_weight=1, T=2))
    l_out = train_detector(lcfg, f'{work}/student_ld', dataset=train)
    l_ap = evaluate(l_out, val)
    print('LD STUDENT:', l_ap)

    summary = dict(teacher=t_ap, baseline_student=b_ap, ld_student=l_ap,
                   ld_gain_mAP=round(l_ap['bbox_mAP'] - b_ap['bbox_mAP'], 4))
    print(json.dumps(summary, indent=2))
    with open(args.out, 'w') as f:
        json.dump(summary, f, indent=2)


if __name__ == '__main__':
    main()
