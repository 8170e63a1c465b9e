#!/usr/bin/env python
"""Consume a serialized StableHLO detector WITHOUT the ld_tpu framework.

Companion to export_stablehlo.py and the answer to "what loads the
artifact?" (the reference's equivalent consumers are onnxruntime /
TensorRT for its pytorch2onnx.py export). The exported blob is fully
self-contained — weights baked in, decode + NMS included — so serving it
needs only jax (any PJRT backend: TPU, CPU, GPU), not ld_tpu, not the
config system, not the checkpoint. This script deliberately imports
nothing from ld_tpu.

    python tools/deployment/export_stablehlo.py CONFIG CKPT --out det.bin
    python tools/deployment/run_stablehlo.py det.bin --image demo/demo.jpg
"""
import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('artifact', help='serialized StableHLO from '
                                     'export_stablehlo.py')
    ap.add_argument('--image', default=None,
                    help='jpg/png to run; random input when omitted')
    ap.add_argument('--score-thr', type=float, default=0.3)
    args = ap.parse_args()

    import jax
    from jax import export as jax_export

    with open(args.artifact, 'rb') as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    (img_aval, hw_aval) = exported.in_avals
    _, h, w, _ = img_aval.shape
    print(f'artifact input: {img_aval.shape} {img_aval.dtype}')

    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    if args.image:
        from PIL import Image
        img = Image.open(args.image).convert('RGB')
        ow, oh = img.size
        scale = min(h / oh, w / ow)
        nh, nw = int(round(oh * scale)), int(round(ow * scale))
        arr = np.asarray(img.resize((nw, nh)), np.float32)
        canvas = np.zeros((h, w, 3), np.float32)
        canvas[:nh, :nw] = (arr - mean) / std
    else:
        scale, nh, nw = 1.0, h, w
        canvas = np.random.RandomState(0).randn(h, w, 3).astype(np.float32)

    dets, labels, valid = jax.jit(exported.call)(
        canvas[None], np.asarray([[float(nh), float(nw)]], np.float32))
    dets, labels = np.asarray(dets[0]), np.asarray(labels[0])
    keep = (dets[:, 4] >= args.score_thr) & (labels >= 0) & (dets[:, 4] > 0)
    out = [dict(bbox=[round(float(v) / scale, 1) for v in d[:4]],
                score=round(float(d[4]), 3), label=int(l))
           for d, l in zip(dets[keep], labels[keep])]
    print(json.dumps(dict(detections=out), indent=2))


if __name__ == '__main__':
    main()
