#!/usr/bin/env python
"""Rank images by evaluation quality and dump the best/worst visualizations.

Parity: /root/reference/tools/analysis_tools/analyze_results.py.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

from ld_tpu import Config
from ld_tpu.data import build_dataset
from ld_tpu.evaluation.mean_ap import tpfp_default


def image_score(res, ann, iou_thr=0.5):
    boxes = np.asarray(res['boxes'])
    if len(boxes) == 0:
        return 0.0 if len(ann['bboxes']) else 1.0
    tp, fp = tpfp_default(boxes.astype(np.float64),
                          ann['bboxes'].astype(np.float64),
                          ann.get('bboxes_ignore', np.zeros((0, 4))),
                          iou_thr)
    denom = max(len(ann['bboxes']) + fp.sum(), 1)
    return float(tp.sum()) / denom


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results')
    p.add_argument('--topk', type=int, default=10)
    p.add_argument('--show-dir', default=None,
                   help='save GT-vs-pred visualizations of the ranked '
                        'images here (reference imshow_gt_det_bboxes)')
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data['test'])
    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    scores = [image_score(r, dataset.get_ann_info(i))
              for i, r in enumerate(results)]
    order = np.argsort(scores)
    print('worst images:')
    for i in order[:args.topk]:
        print(f'  {dataset.img_infos[i]["filename"]}: {scores[i]:.3f}')
    print('best images:')
    for i in order[::-1][:args.topk]:
        print(f'  {dataset.img_infos[i]["filename"]}: {scores[i]:.3f}')
    if args.show_dir:
        from ld_tpu.apis import imshow_gt_det_bboxes
        os.makedirs(args.show_dir, exist_ok=True)
        prefix = getattr(dataset, 'img_prefix', '') or ''
        for tag, idxs in (('worst', order[:args.topk]),
                          ('best', order[::-1][:args.topk])):
            for rank, i in enumerate(idxs):
                info = dataset.img_infos[i]
                img_path = os.path.join(prefix, info['filename'])
                ann = dataset.get_ann_info(i)
                out = os.path.join(
                    args.show_dir,
                    f'{tag}_{rank}_{scores[i]:.3f}_' +
                    os.path.basename(info['filename']))
                imshow_gt_det_bboxes(img_path, ann, results[i],
                                     class_names=getattr(dataset, 'CLASSES',
                                                         None),
                                     out_file=out)
        print(f'visualizations -> {args.show_dir}')


if __name__ == '__main__':
    main()
