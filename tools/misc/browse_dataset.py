#!/usr/bin/env python
"""Visualize pipeline outputs (images + gt boxes) for a config.

Parity: /root/reference/tools/misc/browse_dataset.py.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

from ld_tpu import Config
from ld_tpu.data import build_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--split', default='train')
    p.add_argument('--num', type=int, default=8)
    p.add_argument('--out-dir', default='browse_out')
    args = p.parse_args()

    import cv2
    cfg = Config.fromfile(args.config)
    ds = build_dataset(cfg.data[args.split])
    os.makedirs(args.out_dir, exist_ok=True)
    norm = None
    for t in cfg.data[args.split].get('pipeline', []):
        if t.get('type') == 'Normalize':
            norm = t
    for i in range(min(args.num, len(ds))):
        s = ds[i]
        img = s['img']
        if norm is not None:
            img = img * np.asarray(norm['std']) + np.asarray(norm['mean'])
            if norm.get('to_rgb'):
                img = img[..., ::-1]
        img = np.clip(img, 0, 255).astype(np.uint8).copy()
        for box in s.get('gt_bboxes', []):
            x1, y1, x2, y2 = box.astype(int)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
        out = os.path.join(args.out_dir, f'{i}.jpg')
        cv2.imwrite(out, img)
        print(f'{out}: {img.shape}, {len(s.get("gt_bboxes", []))} boxes')


if __name__ == '__main__':
    main()
