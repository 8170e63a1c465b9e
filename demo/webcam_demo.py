"""Webcam / video-stream demo (parity: /root/reference/demo/webcam_demo.py).

Captures frames with OpenCV, runs the jitted detector at a fixed static
input shape (one compile, then per-frame inference), draws detections.
Gated on cv2 + an attached camera; in headless environments use
demo/image_demo.py instead.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('checkpoint', nargs='?', default=None)
    ap.add_argument('--camera-id', type=int, default=0)
    ap.add_argument('--score-thr', type=float, default=0.3)
    ap.add_argument('--input-size', type=int, nargs=2, default=(480, 640),
                    help='static (H, W) the jit graph is compiled for')
    args = ap.parse_args()

    try:
        import cv2
    except ImportError as e:
        raise SystemExit('webcam_demo requires opencv-python (cv2); '
                         'use demo/image_demo.py for file input.') from e

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ld_tpu.apis.inference import init_detector

    det, variables = init_detector(args.config, args.checkpoint)
    h, w = args.input_size

    @jax.jit
    def infer(variables, image):
        batch = dict(image=image,
                     img_hw=jnp.asarray([[float(h), float(w)]]))
        return det.forward_test(variables, batch)

    cap = cv2.VideoCapture(args.camera_id)
    if not cap.isOpened():
        raise SystemExit(f'camera {args.camera_id} not available')
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    print('press ESC to quit')
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        img = cv2.resize(frame, (w, h))
        inp = (img[:, :, ::-1].astype(np.float32) - mean) / std
        dets, labels, n = infer(variables, jnp.asarray(inp[None]))
        dets = np.asarray(dets[0])
        labels = np.asarray(labels[0])
        for (x1, y1, x2, y2, s), lab in zip(dets, labels):
            if s < args.score_thr:
                continue
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 255, 0), 2)
            cv2.putText(img, f'{int(lab)}:{s:.2f}', (int(x1), int(y1) - 4),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
        cv2.imshow('ld_tpu webcam demo', img)
        if cv2.waitKey(1) == 27:
            break
    cap.release()
    cv2.destroyAllWindows()


if __name__ == '__main__':
    main()
