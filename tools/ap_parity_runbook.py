#!/usr/bin/env python
"""Turn-key COCO AP-parity runbook (VERDICT r02 Next #4).

Given mounted COCO + published .pth checkpoints, runs the full parity
recipe in one command:

  1. convert the published GFL-R50 1x checkpoint and evaluate it with ZERO
     training  -> must reproduce the reference's 40.1 val AP
     (/root/reference/README.md:134) — this isolates weight-conversion +
     inference + COCOeval parity from training parity;
  2. convert the GFL-R101 mstrain-2x teacher, train
     configs/ld/ld_r50_gflv1_r101_fpn_coco_1x.py (1x schedule), evaluate
     -> target 42.1 val AP (/root/reference/README.md:163, the LD paper's
     headline; training recipe README.md:73,113).

Real run:
    python tools/ap_parity_runbook.py \
        --coco-root /data/coco \
        --gfl-r50-pth ckpts/gfl_r50_fpn_1x.pth \
        --teacher-pth ckpts/gfl_r101_fpn_mstrain_2x.pth \
        --work-dir work_dirs/ap_parity [--skip-train] [--max-images N]

Dry run (no COCO, no checkpoints — CPU-safe, used by tests):
    python tools/ap_parity_runbook.py --dry-run
synthesizes shape-faithful mmdet state dicts for GFL-R50, the R101
teacher, and the R101-DCN teacher, converts each STRICTLY, validates them
leaf-for-leaf against the config-built models, evaluates two synthetic
images, and runs one real LD train step against the synthesized teacher
.pth — proving the whole pipeline is turn-key up to the data mount.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

GFL_R50_CFG = 'configs/gfl/gfl_r50_fpn_1x_coco.py'
LD_R50_CFG = 'configs/ld/ld_r50_gflv1_r101_fpn_coco_1x.py'
LD_R101DCN_CFG = 'configs/ld/ld_r101_gflv1_r101dcn_fpn_coco_2x.py'
EXPECT = {'gfl_r50_zero_train_AP': 40.1, 'ld_r50_trained_AP': 42.1}

RESNET_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def synth_mmdet_gfl_state_dict(depth=50, num_classes=80, feat=256,
                               stacked=4, reg_max=16,
                               stage_with_dcn=(False, False, False, False),
                               seed=0):
    """A random state dict with EXACTLY the keys/shapes of a published
    mmdet GFL checkpoint (backbone.resnet + neck.FPN + bbox_head.GFLHead)
    — the dry-run stand-in for the real .pth files."""
    rs = np.random.RandomState(seed)

    def t(*shape):
        return (rs.randn(*shape) * 0.05).astype(np.float32)

    sd = {}

    def bn(prefix, c):
        sd[f'{prefix}.weight'] = np.abs(t(c)) + 0.5
        sd[f'{prefix}.bias'] = t(c)
        sd[f'{prefix}.running_mean'] = t(c)
        sd[f'{prefix}.running_var'] = np.abs(t(c)) + 0.5
        sd[f'{prefix}.num_batches_tracked'] = np.int64(1000)

    sd['backbone.conv1.weight'] = t(64, 3, 7, 7)
    bn('backbone.bn1', 64)
    in_ch = 64
    for s, nblocks in enumerate(RESNET_BLOCKS[depth], start=1):
        planes = 64 * 2 ** (s - 1)
        for b in range(nblocks):
            p = f'backbone.layer{s}.{b}'
            sd[f'{p}.conv1.weight'] = t(planes, in_ch, 1, 1)
            bn(f'{p}.bn1', planes)
            sd[f'{p}.conv2.weight'] = t(planes, planes, 3, 3)
            if stage_with_dcn[s - 1]:
                sd[f'{p}.conv2.conv_offset.weight'] = t(27, planes, 3, 3)
                sd[f'{p}.conv2.conv_offset.bias'] = t(27)
            bn(f'{p}.bn2', planes)
            sd[f'{p}.conv3.weight'] = t(planes * 4, planes, 1, 1)
            bn(f'{p}.bn3', planes * 4)
            if b == 0:
                sd[f'{p}.downsample.0.weight'] = t(planes * 4, in_ch, 1, 1)
                bn(f'{p}.downsample.1', planes * 4)
            in_ch = planes * 4
    for i, c in enumerate((512, 1024, 2048)):       # start_level=1
        sd[f'neck.lateral_convs.{i}.conv.weight'] = t(feat, c, 1, 1)
        sd[f'neck.lateral_convs.{i}.conv.bias'] = t(feat)
    for i in range(5):                               # 3 + 2 on_output
        sd[f'neck.fpn_convs.{i}.conv.weight'] = t(feat, feat, 3, 3)
        sd[f'neck.fpn_convs.{i}.conv.bias'] = t(feat)
    for kind in ('cls', 'reg'):
        for i in range(stacked):
            sd[f'bbox_head.{kind}_convs.{i}.conv.weight'] = t(
                feat, feat, 3, 3)
            sd[f'bbox_head.{kind}_convs.{i}.gn.weight'] = np.ones(
                feat, np.float32)
            sd[f'bbox_head.{kind}_convs.{i}.gn.bias'] = t(feat)
    sd['bbox_head.gfl_cls.weight'] = t(num_classes, feat, 3, 3)
    sd['bbox_head.gfl_cls.bias'] = np.full(num_classes, -4.595,
                                           np.float32)
    sd['bbox_head.gfl_reg.weight'] = t(4 * (reg_max + 1), feat, 3, 3)
    sd['bbox_head.gfl_reg.bias'] = t(4 * (reg_max + 1))
    for i in range(5):
        sd[f'bbox_head.scales.{i}.scale'] = np.float32(1.0)
    return sd


def _apply_coco_root(cfg, coco_root):
    for split in ('train', 'val', 'test'):
        d = cfg.data[split]
        name = 'train2017' if split == 'train' else 'val2017'
        d['ann_file'] = os.path.join(coco_root,
                                     f'annotations/instances_{name}.json')
        d['img_prefix'] = os.path.join(coco_root, name) + '/'


def run_zero_train_eval(config, ckpt, coco_root=None, max_images=None):
    """Convert + evaluate a published checkpoint — no training."""
    from ld_tpu import Config
    from ld_tpu.apis import eval_detector, init_detector
    from ld_tpu.data import build_dataset
    cfg = Config.fromfile(config)
    if coco_root:
        _apply_coco_root(cfg, coco_root)
    detector, variables = init_detector(cfg, ckpt)   # strict .pth convert
    dataset = build_dataset(cfg.data['test'])
    results = eval_detector(detector, variables, dataset,
                            pad_hw=tuple(map(tuple, cfg['pad_to']))
                            if isinstance(cfg['pad_to'][0], (list, tuple))
                            else tuple(cfg['pad_to']),
                            max_images=max_images)
    return dataset.evaluate(results, metric='bbox')


def run_ld_train(config, teacher_pth, work_dir, coco_root=None,
                 max_steps=None):
    """Train the LD config; exports final weights to <work_dir>/ld_final.npz
    and returns its path."""
    from ld_tpu import Config
    from ld_tpu.apis.train import train_detector
    from ld_tpu.utils.checkpoint import save_variables
    cfg = Config.fromfile(config)
    if coco_root:
        _apply_coco_root(cfg, coco_root)
    cfg['teacher_ckpt'] = teacher_pth
    cfg.model['teacher_ckpt'] = teacher_pth
    ret = train_detector(cfg, work_dir, max_steps=max_steps)
    final = os.path.join(work_dir, 'ld_final.npz')
    save_variables(final, {'params': ret['state'].params,
                           'batch_stats': ret['state'].batch_stats})
    return final


def _validate_synth(config, sd, what, teacher=False):
    """Strict-convert `sd` and leaf-verify against the config-built model."""
    import jax
    from ld_tpu import Config
    from ld_tpu.models import build_detector
    from ld_tpu.utils.checkpoint import (convert_torch_state_dict,
                                         validate_variables)
    cfg = Config.fromfile(config)
    det = build_detector(cfg.model)
    variables = convert_torch_state_dict(sd)
    unmapped = variables.pop('_unmapped')
    assert not unmapped, (what, unmapped[:10])
    init = (det.init_teacher_variables if teacher else det.init_variables)
    template = jax.eval_shape(
        lambda: init(jax.random.PRNGKey(0), (1, 64, 96, 3)))
    validate_variables(variables, template, what=what)
    print(f'[dry-run] {what}: strict convert + template validation OK '
          f'({sum(v.size for v in jax.tree_util.tree_leaves(variables))/1e6:.1f}M values)')
    return variables


def dry_run(work_dir):
    import torch
    from ld_tpu import Config
    os.makedirs(work_dir, exist_ok=True)

    # 1. GFL-R50: synth checkpoint -> strict convert -> validate -> eval
    sd50 = synth_mmdet_gfl_state_dict(depth=50, seed=0)
    _validate_synth(GFL_R50_CFG, sd50, 'synth gfl_r50 checkpoint')
    p50 = os.path.join(work_dir, 'synth_gfl_r50.pth')
    torch.save({'state_dict': {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd50.items()}}, p50)

    from ld_tpu.apis import eval_detector, init_detector
    from ld_tpu.data import build_dataset
    cfg = Config.fromfile(GFL_R50_CFG)
    detector, variables = init_detector(cfg, p50)
    ds = build_dataset(dict(
        type='SyntheticDetectionDataset', num_images=2, hw=(160, 224),
        pipeline=[dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                       std=[58.395, 57.12, 57.375], to_rgb=True),
                  dict(type='Pad', size_divisor=32),
                  dict(type='Collect', keys=['img'])]))
    results = eval_detector(detector, variables, ds, pad_hw=(160, 224))
    metrics = ds.evaluate(results, metric='bbox')
    print(f'[dry-run] gfl_r50 zero-train eval on 2 synthetic images OK '
          f'(mAP={metrics["bbox_mAP"]:.3f})')

    # 2. teachers: R101 and R101-DCN synth checkpoints validate against the
    #    LD configs' teacher trees (the DCN one pins offset/mask mapping)
    sd101 = synth_mmdet_gfl_state_dict(depth=101, seed=1)
    _validate_synth(LD_R50_CFG, sd101, 'synth gfl_r101 teacher',
                    teacher=True)
    sd_dcn = synth_mmdet_gfl_state_dict(
        depth=101, seed=2, stage_with_dcn=(False, True, True, True))
    _validate_synth(LD_R101DCN_CFG, sd_dcn, 'synth r101-DCN teacher',
                    teacher=True)

    # 3. one REAL LD train step against the synthesized teacher .pth
    p101 = os.path.join(work_dir, 'synth_gfl_r101_teacher.pth')
    torch.save({'state_dict': {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd101.items()}}, p101)
    cfg = Config.fromfile(LD_R50_CFG)
    cfg.model['teacher_ckpt'] = p101
    cfg['pad_to'] = (160, 224)
    cfg['max_gts_per_image'] = 8
    cfg.data['train'] = dict(
        type='SyntheticDetectionDataset', num_images=8, hw=(160, 224),
        num_classes=80, pipeline=[
            dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_rgb=True),
            dict(type='Pad', size_divisor=32),
            dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])])
    cfg.data['val'] = dict(cfg.data['train'])
    cfg.data['test'] = dict(cfg.data['train'])
    cfg.data['samples_per_gpu'] = 1
    from ld_tpu.apis.train import train_detector
    train_detector(cfg, os.path.join(work_dir, 'ld_dryrun'), max_steps=1)
    print('[dry-run] LD train step with converted synth teacher OK')
    print('[dry-run] ALL GREEN — runbook is turn-key up to the COCO mount')


def main():
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--dry-run', action='store_true')
    p.add_argument('--coco-root', default=None)
    p.add_argument('--gfl-r50-pth', default=None)
    p.add_argument('--teacher-pth', default=None)
    p.add_argument('--work-dir', default='work_dirs/ap_parity')
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--skip-train', action='store_true')
    p.add_argument('--max-steps', type=int, default=None)
    args = p.parse_args()

    if args.dry_run:
        dry_run(args.work_dir)
        return

    assert args.coco_root, '--coco-root required (or use --dry-run)'
    os.makedirs(args.work_dir, exist_ok=True)
    summary = {'expected': EXPECT}

    if args.gfl_r50_pth:
        m = run_zero_train_eval(GFL_R50_CFG, args.gfl_r50_pth,
                                args.coco_root, args.max_images)
        summary['gfl_r50_zero_train'] = m
        print(f"STEP 1 gfl_r50 zero-train AP = {m['bbox_mAP']*100:.1f} "
              f"(reference {EXPECT['gfl_r50_zero_train_AP']})")

    if not args.skip_train:
        assert args.teacher_pth, '--teacher-pth required for the LD train'
        final = run_ld_train(LD_R50_CFG, args.teacher_pth, args.work_dir,
                             args.coco_root, max_steps=args.max_steps)
        m = run_zero_train_eval(LD_R50_CFG, final, args.coco_root,
                                args.max_images)
        summary['ld_r50_trained'] = m
        print(f"STEP 2 LD-trained AP = {m['bbox_mAP']*100:.1f} "
              f"(reference {EXPECT['ld_r50_trained_AP']})")

    out = os.path.join(args.work_dir, 'ap_parity_summary.json')
    with open(out, 'w') as f:
        json.dump(summary, f, indent=2, default=float)
    print(f'summary -> {out}')


if __name__ == '__main__':
    main()
