#!/usr/bin/env python
"""Convert PASCAL VOC XML annotations to a COCO-format json.

Parity: /root/reference/tools/dataset_converters/pascal_voc.py.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from ld_tpu.data.voc import VOCDataset, VOC_CLASSES


def main():
    p = argparse.ArgumentParser()
    p.add_argument('ann_file', help='VOC split txt (image id list)')
    p.add_argument('voc_root', help='VOCdevkit/VOC2007-style dir')
    p.add_argument('out_json')
    args = p.parse_args()
    ds = VOCDataset(args.ann_file, pipeline=[], img_prefix=args.voc_root)
    images, annotations = [], []
    aid = 1
    for i, (info, ann) in enumerate(zip(ds.img_infos, ds.annotations)):
        images.append(dict(id=i, file_name=info['filename'],
                           width=info['width'], height=info['height']))
        for box, label in zip(ann['bboxes'], ann['labels']):
            x1, y1, x2, y2 = [float(v) for v in box]
            annotations.append(dict(
                id=aid, image_id=i, category_id=int(label) + 1,
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=(x2 - x1) * (y2 - y1), iscrowd=0))
            aid += 1
    categories = [dict(id=c + 1, name=n) for c, n in enumerate(VOC_CLASSES)]
    with open(args.out_json, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)
    print(f'wrote {args.out_json}: {len(images)} images, {aid-1} boxes')


if __name__ == '__main__':
    main()
