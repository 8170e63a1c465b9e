#!/usr/bin/env python
"""Single-image demo. Parity: /root/reference/demo/image_demo.py."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from ld_tpu.apis import inference_detector, init_detector, show_result
from ld_tpu.data import COCO_CLASSES


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--out-file', default='demo_out.jpg')
    args = p.parse_args()

    detector, variables = init_detector(args.config, args.checkpoint)
    result = inference_detector(detector, variables, args.img)
    show_result(args.img, result, class_names=COCO_CLASSES,
                score_thr=args.score_thr, out_file=args.out_file)
    n = (result['boxes'][:, 4] >= args.score_thr).sum()
    print(f'{n} detections >= {args.score_thr} -> {args.out_file}')


if __name__ == '__main__':
    main()
