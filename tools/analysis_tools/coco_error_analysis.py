"""Per-class COCO error decomposition.

Parity: /root/reference/tools/analysis_tools/coco_error_analysis.py — for
each class, decompose the precision gap at IoU=0.75 into: localization
(would match at IoU=0.1), class confusion (matches a gt of another class),
background false positives, and missed gts. The reference drives matplotlib
through pycocotools' precision dumps; here the same quantities come from
our native evaluator's match structure and are written as JSON (plots are
optional when matplotlib is available).

Usage:
    python tools/analysis_tools/coco_error_analysis.py results.pkl \
        --config CONFIG --out errors.json
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def analyze(dataset, results, iou_strict=0.75, iou_loose=0.1):
    from ld_tpu.ops.boxes import bbox_overlaps
    import jax.numpy as jnp

    num_classes = len(dataset.CLASSES)
    stats = {c: dict(tp=0, loc=0, cls=0, bg=0, fn=0, n_gt=0)
             for c in dataset.CLASSES}
    for i, det in enumerate(results):
        ann = dataset.get_ann_info(i)
        gtb = np.asarray(ann['bboxes'], np.float32).reshape(-1, 4)
        gtl = np.asarray(ann['labels'], np.int64).reshape(-1)
        matched = np.zeros(len(gtb), bool)
        for c in range(num_classes):
            cls_dets = det[c] if isinstance(det, (list, tuple)) else \
                det['bboxes'][det['labels'] == c]
            cls_dets = np.asarray(cls_dets).reshape(-1, 5)
            name = dataset.CLASSES[c]
            stats[name]['n_gt'] += int((gtl == c).sum())
            if len(cls_dets) == 0:
                continue
            order = np.argsort(-cls_dets[:, 4])
            cls_dets = cls_dets[order]
            if len(gtb):
                iou = np.asarray(bbox_overlaps(
                    jnp.asarray(cls_dets[:, :4]), jnp.asarray(gtb)))
            else:
                iou = np.zeros((len(cls_dets), 0))
            for d in range(len(cls_dets)):
                if iou.shape[1]:
                    same = iou[d] * (gtl == c)
                    best = same.max()
                    if best >= iou_strict:
                        j = same.argmax()
                        if not matched[j]:
                            matched[j] = True
                            stats[name]['tp'] += 1
                            continue
                    if best >= iou_loose:
                        stats[name]['loc'] += 1
                        continue
                    if (iou[d] * (gtl != c)).max() >= iou_strict:
                        stats[name]['cls'] += 1
                        continue
                stats[name]['bg'] += 1
        for j in range(len(gtb)):
            if not matched[j]:
                stats[dataset.CLASSES[gtl[j]]]['fn'] += 1
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('results', help='pkl of per-image detections')
    ap.add_argument('--config', required=True)
    ap.add_argument('--out', default='coco_errors.json')
    args = ap.parse_args()
    from ld_tpu import Config
    from ld_tpu.data import build_dataset
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data['test'])
    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    stats = analyze(dataset, results)
    with open(args.out, 'w') as f:
        json.dump(stats, f, indent=1)
    print(f'per-class error decomposition -> {args.out}')
    worst = sorted(stats.items(),
                   key=lambda kv: -(kv[1]['loc'] + kv[1]['cls'] +
                                    kv[1]['bg']))[:5]
    for name, s in worst:
        print(f'  {name}: tp={s["tp"]} loc-err={s["loc"]} cls-err={s["cls"]}'
              f' bg-fp={s["bg"]} missed={s["fn"]} (n_gt={s["n_gt"]})')


if __name__ == '__main__':
    main()
