#!/usr/bin/env python
"""Turn-key AP-parity runbook — one command per BASELINE.md row.

Every published row of the reference's README tables
(/root/reference/README.md:130-184 — COCO GFL baselines, LD students,
self-LD, the GFLV2 student, the +GI variant, the R101-DCN->R101 2x row,
and the 4-epoch VOC recipe) has a named entry in ROWS below carrying its
config, teacher spec, dataset and expected AP. List them:

    python tools/ap_parity_runbook.py --list-rows

Real run (mounted data + published .pth checkpoints):

    # zero-train rows (convert a published ckpt, evaluate — isolates
    # weight-conversion + inference + eval parity from training parity):
    python tools/ap_parity_runbook.py --row gfl_r50_1x \
        --coco-root /data/coco --ckpt ckpts/gfl_r50_fpn_1x.pth

    # LD training rows (convert the teacher, train, evaluate):
    python tools/ap_parity_runbook.py --row ld_r50_1x \
        --coco-root /data/coco \
        --teacher-pth ckpts/gfl_r101_fpn_mstrain_2x.pth
    python tools/ap_parity_runbook.py --row ld_r18_voc \
        --voc-root /data/VOCdevkit --teacher-pth ckpts/gfl_r101_voc.pth

Dry run (no data, no checkpoints — CPU-safe, used by tests):

    python tools/ap_parity_runbook.py --dry-run [--row NAME ...] \
        [--convert-only]

synthesizes a shape-faithful mmdet state dict for each selected row
(BasicBlock R18/R34, Bottleneck R50/R101, R101-DCN offsets, the GFLV2
DGQP reg_conf branch, VOC 20-class heads), converts it STRICTLY,
validates it leaf-for-leaf against the config-built model, and (unless
--convert-only) evaluates two synthetic images / runs one real LD train
step against the synthesized teacher .pth — proving every row is
turn-key up to the data mount.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

RESNET_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3)}
BASIC = {18, 34}


def synth_mmdet_gfl_state_dict(depth=50, num_classes=80, feat=256,
                               stacked=4, reg_max=16,
                               stage_with_dcn=(False, False, False, False),
                               gflv2=False, reg_topk=4, reg_channels=64,
                               groups=1, base_width=64, seed=0):
    """A random state dict with EXACTLY the keys/shapes of a published
    mmdet GFL/GFocalV2 checkpoint — the dry-run stand-in for real .pth
    files. BasicBlock for R18/R34, Bottleneck otherwise, grouped-conv
    ResNeXt Bottleneck when groups>1 (mmdet resnext.py width =
    planes * (base_width/64) * groups); optional DCN conv_offset keys;
    optional DGQP reg_conf branch (GFLV2,
    /root/reference/mmdet/models/dense_heads/gfocal_head.py:145-149)."""
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
    basic = depth in BASIC
    for s, nblocks in enumerate(RESNET_BLOCKS[depth], start=1):
        planes = 64 * 2 ** (s - 1)
        out_ch = planes if basic else planes * 4
        width = planes if groups == 1 else \
            int(planes * (base_width / 64.0)) * groups
        for b in range(nblocks):
            p = f'backbone.layer{s}.{b}'
            if basic:
                sd[f'{p}.conv1.weight'] = t(planes, in_ch, 3, 3)
                bn(f'{p}.bn1', planes)
                sd[f'{p}.conv2.weight'] = t(planes, planes, 3, 3)
                if stage_with_dcn[s - 1]:
                    sd[f'{p}.conv2.conv_offset.weight'] = t(27, planes, 3, 3)
                    sd[f'{p}.conv2.conv_offset.bias'] = t(27)
                bn(f'{p}.bn2', planes)
            else:
                sd[f'{p}.conv1.weight'] = t(width, in_ch, 1, 1)
                bn(f'{p}.bn1', width)
                sd[f'{p}.conv2.weight'] = t(width, width // groups, 3, 3)
                if stage_with_dcn[s - 1]:
                    sd[f'{p}.conv2.conv_offset.weight'] = t(27, width, 3, 3)
                    sd[f'{p}.conv2.conv_offset.bias'] = t(27)
                bn(f'{p}.bn2', width)
                sd[f'{p}.conv3.weight'] = t(planes * 4, width, 1, 1)
                bn(f'{p}.bn3', planes * 4)
            if b == 0 and (s > 1 or not basic):
                sd[f'{p}.downsample.0.weight'] = t(out_ch, in_ch, 1, 1)
                bn(f'{p}.downsample.1', out_ch)
            in_ch = out_ch
    fpn_in = [in_ch // 4, in_ch // 2, in_ch]
    for i, c in enumerate(fpn_in):                   # start_level=1
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
    if gflv2:
        total_dim = reg_topk + 1                     # add_mean=True
        sd['bbox_head.reg_conf.0.weight'] = t(reg_channels, 4 * total_dim,
                                              1, 1)
        sd['bbox_head.reg_conf.0.bias'] = t(reg_channels)
        sd['bbox_head.reg_conf.2.weight'] = t(1, reg_channels, 1, 1)
        sd['bbox_head.reg_conf.2.bias'] = t(1)
    for i in range(5):
        sd[f'bbox_head.scales.{i}.scale'] = np.float32(1.0)
    return sd


class Row:
    """One BASELINE.md row: what to run and what AP to expect."""

    def __init__(self, config, expect_ap, kind='zero', dataset='coco',
                 student=None, teacher=None, source=''):
        self.config = config
        self.expect_ap = expect_ap
        self.kind = kind            # 'zero' (convert+eval) | 'train' (LD)
        self.dataset = dataset      # 'coco' | 'voc'
        self.student = student or {}   # synth spec for zero rows
        self.teacher = teacher          # synth spec for train rows
        self.source = source            # reference README line


ROWS = {
    # ---- COCO zero-train baselines (README.md:130-136) ----
    'gfl_r18_1x': Row('configs/gfl/gfl_r18_fpn_1x_coco.py', 35.8,
                      student=dict(depth=18), source='README.md:130'),
    'gfl_r34_1x': Row('configs/gfl/gfl_r34_fpn_1x_coco.py', 38.9,
                      student=dict(depth=34), source='README.md:132'),
    'gfl_r50_1x': Row('configs/gfl/gfl_r50_fpn_1x_coco.py', 40.1,
                      student=dict(depth=50), source='README.md:134'),
    'gfl_r101_2x': Row('configs/gfl/gfl_r101_fpn_mstrain_2x_coco.py', 44.6,
                       student=dict(depth=101), source='README.md:136'),
    # ---- COCO LD training rows (README.md:131-163, 249-259) ----
    'ld_r18_1x': Row('configs/ld/ld_r18_gflv1_r101_fpn_coco_1x.py', 36.5,
                     kind='train', teacher=dict(depth=101),
                     source='README.md:131 (37.5 with VLR+KD, :249)'),
    'ld_r34_1x': Row('configs/ld/ld_r34_gflv1_r101_fpn_coco_1x.py', 39.8,
                     kind='train', teacher=dict(depth=101),
                     source='README.md:133 (41.0 with VLR+KD, :251)'),
    'ld_r50_1x': Row('configs/ld/ld_r50_gflv1_r101_fpn_coco_1x.py', 42.1,
                     kind='train', teacher=dict(depth=101),
                     source='README.md:163 (the headline row)'),
    'ld_r50_gi_1x': Row('configs/ld/ld_r50_gflv1_r101_fpn_coco_1x_gi.py',
                        42.4, kind='train', teacher=dict(depth=101),
                        source='README.md:255 (+GI)'),
    'ld_r50_self_1x': Row('configs/ld/ld_r50_self_fpn_coco_1x.py', 40.6,
                          kind='train', teacher=dict(depth=50),
                          source='README.md:147 (self-LD R50)'),
    'ldv2_r50_1x': Row('configs/ldv2/ld_r50_gflv2_r101_fpn_1x.py', 42.7,
                       kind='train', teacher=dict(depth=101, gflv2=True),
                       source='README.md:259 (GFLV2 student)'),
    'ld_r101_dcn_2x': Row('configs/ld/ld_r101_gflv1_r101dcn_fpn_coco_2x.py',
                          45.4, kind='train',
                          teacher=dict(depth=101, stage_with_dcn=(
                              False, True, True, True)),
                          source='README.md:137 (R101-DCN->R101 2x)'),
    # ---- VOC 4-epoch recipe (README.md:177-184; AP = COCO-style 50:95
    #      computed by looping eval_map thresholds, voc.py evaluate) ----
    'gfl_r18_voc': Row('configs/gfl/gfl_r18_fpn1x_voc.py', 51.8,
                       dataset='voc', student=dict(depth=18,
                                                   num_classes=20),
                       source='README.md:177'),
    'ld_r18_voc': Row('configs/ld/ld_r18_gflv1_r101_fpn_voc_1x.py', 53.0,
                      kind='train', dataset='voc',
                      teacher=dict(depth=101, num_classes=20),
                      source='README.md:178 (54.0 with VLR KD, :238)'),
    # ---- self-LD rows (README.md:144, :148) ----
    'ld_r18_self_1x': Row('configs/ld/ld_r18_self_fpn_coco_1x.py', 36.1,
                          kind='train', teacher=dict(depth=18),
                          source='README.md:144 (self-LD R18)'),
    'ld_x101_dcn_self_2x': Row(
        'configs/ld/ld_x101_32x4d_dcn_self_2x_coco.py', 47.5, kind='train',
        teacher=dict(depth=101, groups=32, base_width=4,
                     stage_with_dcn=(False, False, True, True)),
        source='README.md:148 (self-LD X-101-32x4d-DCN)'),
    # ---- imitation-ablation arms (README.md:157-161; R-101 -> R-50) ----
    'im_fitnets_r50': Row('configs/im/im_r101_r50_fitnets_1x.py', 40.7,
                          kind='train', teacher=dict(depth=101),
                          source='README.md:158 (FitNets)'),
    'im_inside_gt_r50': Row('configs/im/im_r101_r50_inside_gt_1x.py', 40.7,
                            kind='train', teacher=dict(depth=101),
                            source='README.md:159 (Inside GT Box)'),
    'im_finegrained_r50': Row('configs/im/im_r101_r50_finegrained_1x.py',
                              41.1, kind='train', teacher=dict(depth=101),
                              source='README.md:160 (Fine-Grained)'),
    'im_defeat_r50': Row('configs/im/im_r101_r50_defeat_1x.py', 40.8,
                         kind='train', teacher=dict(depth=101),
                         source='README.md:161 (DeFeat)'),
    # ---- remaining VOC rows (README.md:179-184) ----
    'gfl_r50_voc': Row('configs/gfl/gfl_r50_fpn1x_voc.py', 55.8,
                       dataset='voc', student=dict(depth=50,
                                                   num_classes=20),
                       source='README.md:179'),
    'ld_r50_voc': Row('configs/ld/ld_r50_gflv1_r101_fpn_voc_1x.py', 56.1,
                      kind='train', dataset='voc',
                      teacher=dict(depth=101, num_classes=20),
                      source='README.md:180 (R101->R50 VOC)'),
    'ld_r34_dcn_voc': Row('configs/ld/ld_r34_gflv1_r101dcn_fpn_voc_1x.py',
                          56.7, kind='train', dataset='voc',
                          teacher=dict(depth=101, num_classes=20,
                                       stage_with_dcn=(False, True, True,
                                                       True)),
                          source='README.md:182 (R101-DCN->R34 VOC)'),
    'ld_r101_dcn_voc': Row('configs/ld/ld_r101_gflv1_r101dcn_fpn_voc_1x.py',
                           58.4, kind='train', dataset='voc',
                           teacher=dict(depth=101, num_classes=20,
                                        stage_with_dcn=(False, True, True,
                                                        True)),
                           source='README.md:184 (R101-DCN->R101 VOC)'),
}
# NOT covered: test-dev rows (leaderboard submissions, not locally
# reproducible). Everything else in BASELINE.md has a named row above.


def _apply_data_root(cfg, dataset, root):
    if dataset == 'coco':
        for split in ('train', 'val', 'test'):
            d = cfg.data[split]
            name = 'train2017' if split == 'train' else 'val2017'
            d['ann_file'] = os.path.join(
                root, f'annotations/instances_{name}.json')
            d['img_prefix'] = os.path.join(root, name) + '/'
    else:  # VOCdevkit root: rewrite the relative data/VOCdevkit prefixes
        def rewrite(d):
            for key in ('ann_file', 'img_prefix'):
                v = d.get(key)
                if isinstance(v, (list, tuple)):
                    d[key] = [x.replace('data/VOCdevkit', root) for x in v]
                elif isinstance(v, str):
                    d[key] = v.replace('data/VOCdevkit', root)
        for split in ('train', 'val', 'test'):
            rewrite(cfg.data[split])


def run_zero_train_eval(config, ckpt, dataset='coco', data_root=None,
                        max_images=None):
    """Convert + evaluate a published checkpoint — no training."""
    from ld_tpu import Config
    from ld_tpu.apis import eval_detector, init_detector
    from ld_tpu.data import build_dataset
    cfg = Config.fromfile(config)
    if data_root:
        _apply_data_root(cfg, dataset, data_root)
    detector, variables = init_detector(cfg, ckpt)   # strict .pth convert
    ds = build_dataset(cfg.data['test'])
    results = eval_detector(detector, variables, ds,
                            pad_hw=tuple(map(tuple, cfg['pad_to']))
                            if isinstance(cfg['pad_to'][0], (list, tuple))
                            else tuple(cfg['pad_to']),
                            max_images=max_images)
    if dataset == 'voc':
        return ds.evaluate(results, metric='AP5095')
    return ds.evaluate(results, metric='bbox')


def run_ld_train(config, teacher_pth, work_dir, dataset='coco',
                 data_root=None, max_steps=None):
    """Train an LD row; exports final weights and returns their path."""
    from ld_tpu import Config
    from ld_tpu.apis.train import train_detector
    from ld_tpu.utils.checkpoint import save_variables
    cfg = Config.fromfile(config)
    if data_root:
        _apply_data_root(cfg, dataset, data_root)
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


def _synth_pipeline(num_classes):
    return [dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_rgb=True),
            dict(type='Pad', size_divisor=32),
            dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'])]


def dry_run_row(name, row, work_dir, convert_only=False):
    """Synthesize this row's checkpoint(s), strict-convert + validate, then
    exercise the row's actual path (eval or one LD train step)."""
    import torch
    from ld_tpu import Config
    os.makedirs(work_dir, exist_ok=True)
    print(f'=== [dry-run] row {name} ({row.source}) ===')
    if row.kind == 'zero':
        sd = synth_mmdet_gfl_state_dict(seed=0, **row.student)
        _validate_synth(row.config, sd, f'{name}: synth student ckpt')
        if convert_only:
            return
        pth = os.path.join(work_dir, f'synth_{name}.pth')
        torch.save({'state_dict': {k: torch.from_numpy(np.asarray(v))
                                   for k, v in sd.items()}}, pth)
        from ld_tpu.apis import eval_detector, init_detector
        from ld_tpu.data import build_dataset
        cfg = Config.fromfile(row.config)
        detector, variables = init_detector(cfg, pth)
        nc = row.student.get('num_classes', 80)
        ds = build_dataset(dict(
            type='SyntheticDetectionDataset', num_images=2, hw=(160, 224),
            num_classes=nc, pipeline=_synth_pipeline(nc)[:2] + [
                dict(type='Collect', keys=['img'])]))
        results = eval_detector(detector, variables, ds, pad_hw=(160, 224))
        metrics = ds.evaluate(results, metric='bbox') \
            if row.dataset == 'coco' else ds.evaluate(results)
        print(f'[dry-run] {name}: zero-train eval on 2 synthetic images OK '
              f'({ {k: round(float(v), 3) for k, v in list(metrics.items())[:2]} })')
        return
    # train row: synth the teacher, validate against the config's teacher
    # tree, then one REAL LD train step against the synthesized .pth
    sd_t = synth_mmdet_gfl_state_dict(seed=1, **row.teacher)
    _validate_synth(row.config, sd_t, f'{name}: synth teacher ckpt',
                    teacher=True)
    if convert_only:
        return
    pth = os.path.join(work_dir, f'synth_{name}_teacher.pth')
    torch.save({'state_dict': {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd_t.items()}}, pth)
    cfg = Config.fromfile(row.config)
    nc = row.teacher.get('num_classes', 80)
    cfg.model['teacher_ckpt'] = pth
    cfg['pad_to'] = (160, 224)
    cfg['max_gts_per_image'] = 8
    cfg.data['train'] = dict(
        type='SyntheticDetectionDataset', num_images=8, hw=(160, 224),
        num_classes=nc, pipeline=_synth_pipeline(nc))
    cfg.data['val'] = dict(cfg.data['train'])
    cfg.data['test'] = dict(cfg.data['train'])
    cfg.data['samples_per_gpu'] = 1
    cfg.pop('batch_scales', None)
    from ld_tpu.apis.train import train_detector
    train_detector(cfg, os.path.join(work_dir, f'dryrun_{name}'),
                   max_steps=1)
    print(f'[dry-run] {name}: LD train step with converted synth teacher OK')


def main():
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--dry-run', action='store_true')
    p.add_argument('--list-rows', action='store_true')
    p.add_argument('--row', action='append', default=None,
                   help='row name(s) from ROWS; default: all (dry-run) / '
                        'required (real run)')
    p.add_argument('--convert-only', action='store_true',
                   help='dry-run: stop after strict convert + validation')
    p.add_argument('--coco-root', default=None)
    p.add_argument('--voc-root', default=None)
    p.add_argument('--ckpt', default=None,
                   help='published .pth for a zero-train row')
    p.add_argument('--teacher-pth', default=None,
                   help='published teacher .pth for a train row')
    p.add_argument('--work-dir', default='work_dirs/ap_parity')
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--max-steps', type=int, default=None)
    args = p.parse_args()

    if args.list_rows:
        for name, row in ROWS.items():
            print(f'{name:18s} {row.kind:5s} {row.dataset:4s} '
                  f'AP {row.expect_ap:4.1f}  {row.config}  [{row.source}]')
        return

    names = args.row or list(ROWS)
    for n in names:
        assert n in ROWS, (n, sorted(ROWS))

    if args.dry_run:
        # dry runs are CPU-safe by design; never touch the TPU tunnel
        # (the image's axon site hook ignores a shell JAX_PLATFORMS=cpu)
        from ld_tpu.utils.platform import force_cpu
        force_cpu()
        for n in names:
            dry_run_row(n, ROWS[n], args.work_dir,
                        convert_only=args.convert_only)
        print('[dry-run] ALL GREEN — selected rows are turn-key up to '
              'the data mount')
        return

    assert args.row, 'real runs need explicit --row NAME'
    os.makedirs(args.work_dir, exist_ok=True)
    summary = {}
    for n in names:
        row = ROWS[n]
        root = args.coco_root if row.dataset == 'coco' else args.voc_root
        assert root, f'row {n} needs --{row.dataset}-root'
        if row.kind == 'zero':
            assert args.ckpt, f'zero-train row {n} needs --ckpt'
            m = run_zero_train_eval(row.config, args.ckpt, row.dataset,
                                    root, args.max_images)
        else:
            assert args.teacher_pth, f'train row {n} needs --teacher-pth'
            final = run_ld_train(row.config, args.teacher_pth,
                                 os.path.join(args.work_dir, n),
                                 row.dataset, root,
                                 max_steps=args.max_steps)
            m = run_zero_train_eval(row.config, final, row.dataset, root,
                                    args.max_images)
        key = 'mAP' if 'mAP' in m else 'bbox_mAP'
        print(f'ROW {n}: AP = {m[key] * 100:.1f} '
              f'(reference {row.expect_ap}, {row.source})')
        summary[n] = dict(metrics=m, expected=row.expect_ap)
    out = os.path.join(args.work_dir, 'ap_parity_summary.json')
    with open(out, 'w') as f:
        json.dump(summary, f, indent=2, default=float)
    print(f'summary -> {out}')


if __name__ == '__main__':
    main()
