"""Convert Cityscapes instance annotations to COCO-format JSON.

Parity: /root/reference/tools/dataset_converters/cityscapes.py — walks the
gtFine `*_instanceIds.png` maps, extracts the 8 instance classes, emits
per-split COCO json (bbox + polygon-free RLE-style segmentation via our
codec). Self-contained: uses PIL/numpy only.

Usage:
    python tools/dataset_converters/cityscapes.py CITYSCAPES_ROOT \
        --out-dir annotations/
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

# cityscapes instance label ids -> contiguous category (class name)
CLASSES = [('person', 24), ('rider', 25), ('car', 26), ('truck', 27),
           ('bus', 28), ('train', 31), ('motorcycle', 32), ('bicycle', 33)]


def collect_split(root, split):
    from PIL import Image
    from ld_tpu.evaluation.segm_eval import rle_encode

    img_dir = os.path.join(root, 'leftImg8bit', split)
    gt_dir = os.path.join(root, 'gtFine', split)
    images, annotations = [], []
    ann_id = 1
    label_to_cat = {lid: i + 1 for i, (_, lid) in enumerate(CLASSES)}
    for img_id, path in enumerate(sorted(glob.glob(
            os.path.join(img_dir, '*', '*_leftImg8bit.png'))), 1):
        city = os.path.basename(os.path.dirname(path))
        stem = os.path.basename(path).replace('_leftImg8bit.png', '')
        inst_path = os.path.join(gt_dir, city,
                                 stem + '_gtFine_instanceIds.png')
        if not os.path.exists(inst_path):
            continue
        inst = np.asarray(Image.open(inst_path))
        h, w = inst.shape[:2]
        images.append(dict(id=img_id, width=w, height=h,
                           file_name=f'{split}/{city}/{stem}_leftImg8bit.png'))
        for iid in np.unique(inst):
            if iid < 1000:          # stuff / group labels
                continue
            label = iid // 1000
            if label not in label_to_cat:
                continue
            mask = (inst == iid)
            ys, xs = np.nonzero(mask)
            x1, y1 = int(xs.min()), int(ys.min())
            bw, bh = int(xs.max() - x1 + 1), int(ys.max() - y1 + 1)
            rle = rle_encode(mask.astype(np.uint8))
            rle['counts'] = rle['counts'].decode()
            annotations.append(dict(
                id=ann_id, image_id=img_id,
                category_id=label_to_cat[label],
                bbox=[x1, y1, bw, bh], area=int(mask.sum()),
                iscrowd=0, segmentation=rle))
            ann_id += 1
    categories = [dict(id=i + 1, name=n) for i, (n, _) in enumerate(CLASSES)]
    return dict(images=images, annotations=annotations,
                categories=categories)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('cityscapes_root')
    ap.add_argument('--out-dir', default='annotations')
    ap.add_argument('--splits', nargs='+', default=['train', 'val'])
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits:
        coco = collect_split(args.cityscapes_root, split)
        out = os.path.join(args.out_dir,
                           f'instancesonly_filtered_gtFine_{split}.json')
        with open(out, 'w') as f:
            json.dump(coco, f)
        print(f'{split}: {len(coco["images"])} images, '
              f'{len(coco["annotations"])} instances -> {out}')


if __name__ == '__main__':
    main()
