#!/usr/bin/env python
"""Measure int8-PTQ vs fp det-set agreement and speed for any config.

The TPU-native counterpart of the reference's TensorRT-int8 deployment
check (/root/reference/docs/tutorials/onnx2tensorrt.md — "verify the
outputs of onnx and trt models"): quantize the conv compute path with
ld_tpu.ops.quant (per-tensor activation scales from calibration batches,
per-C_out weight scales from the live params), run fp and int8 forwards
on the SAME inputs, and report

  * det-set agreement: greedy IoU>=0.5 + same-label matching of the two
    det lists, F1 over the union (the tests/test_nms_bf16.py metric);
  * mean |score delta| on matched pairs and mean matched IoU;
  * fp vs int8 img/s on the timed shape.

Usage:
  python tools/analysis_tools/quant_agreement.py CONFIG \
      [--checkpoint CKPT] [--shape 800 1344] [--calib-batches 8]

Deploy guidance lives in docs/PERF.md (int8 section): quantization is
opt-in per conv, prediction heads stay fp (quant.DEFAULT_SKIP), and the
agreement number printed here is the gate — do not serve int8 below your
AP-tolerance threshold.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu import Config
from ld_tpu.models import build_detector
from ld_tpu.ops import quant


def det_lists(dets, labels, valid):
    """-> list per image of (boxes(N,4), scores(N,), labels(N,))."""
    dets, labels, valid = (np.asarray(dets), np.asarray(labels),
                           np.asarray(valid).astype(bool))
    out = []
    for i in range(dets.shape[0]):
        v = valid[i]
        out.append((dets[i, v, :4], dets[i, v, 4], labels[i, v]))
    return out


def match_f1(a, b, iou_thr=0.5):
    """Greedy same-label IoU matching; returns (f1, matched_iou_mean,
    score_mad). Both a and b are (boxes, scores, labels) of one image."""
    ab, asc, al = a
    bb, bsc, bl = b
    if len(ab) == 0 and len(bb) == 0:
        return 1.0, 1.0, 0.0
    if len(ab) == 0 or len(bb) == 0:
        return 0.0, 0.0, 0.0
    # pairwise IoU
    x1 = np.maximum(ab[:, None, 0], bb[None, :, 0])
    y1 = np.maximum(ab[:, None, 1], bb[None, :, 1])
    x2 = np.minimum(ab[:, None, 2], bb[None, :, 2])
    y2 = np.minimum(ab[:, None, 3], bb[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (ab[:, 2] - ab[:, 0]) * (ab[:, 3] - ab[:, 1])
    area_b = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
    iou = inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                             1e-9)
    iou = np.where(al[:, None] == bl[None, :], iou, 0.0)
    matched, mious, sdeltas = 0, [], []
    used = np.zeros(len(bb), bool)
    for i in np.argsort(-asc):
        j = int(np.argmax(np.where(used, -1.0, iou[i])))
        if iou[i, j] >= iou_thr and not used[j]:
            used[j] = True
            matched += 1
            mious.append(iou[i, j])
            sdeltas.append(abs(asc[i] - bsc[j]))
    f1 = 2.0 * matched / (len(ab) + len(bb))
    return (f1, float(np.mean(mious)) if mious else 0.0,
            float(np.mean(sdeltas)) if sdeltas else 0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None,
                   help='orbax dir or torch .pth (auto-converted)')
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344])
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--calib-batches', type=int, default=8)
    p.add_argument('--eval-batches', type=int, default=8)
    p.add_argument('--iters', type=int, default=16)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    h, w = args.shape
    b = args.batch
    if args.checkpoint:
        from ld_tpu.apis.inference import init_detector
        det, variables = init_detector(cfg, args.checkpoint)
    else:
        det = build_detector(dict(cfg.model))
        variables = det.init_variables(jax.random.PRNGKey(args.seed),
                                       (1, h, w, 3))

    rng = np.random.RandomState(args.seed)

    def rand_batch():
        return {
            'image': jnp.asarray(
                rng.randn(b, h, w, 3).astype(np.float32)),
            'img_hw': jnp.asarray([[h, w]] * b, jnp.float32),
            'scale_factor': jnp.ones((b, 4), jnp.float32),
        }

    def fwd(v, batch):
        return det.forward_test(v, batch, rescale=False)

    print(f'calibrating over {args.calib_batches} batches ...')
    amax = quant.calibrate(fwd, variables,
                           [rand_batch() for _ in range(args.calib_batches)])
    print(f'  {len(amax)} convs calibrated '
          f'(prediction heads excluded: {len(quant.DEFAULT_SKIP)} patterns)')

    fp = jax.jit(fwd)
    q8 = jax.jit(quant.int8_forward(fwd, amax))

    f1s, mious, sdeltas = [], [], []
    for _ in range(args.eval_batches):
        batch = rand_batch()
        ref = det_lists(*fp(variables, batch))
        got = det_lists(*q8(variables, batch))
        for a, bb_ in zip(ref, got):
            f1, miou, sd = match_f1(a, bb_)
            f1s.append(f1)
            mious.append(miou)
            sdeltas.append(sd)

    def timed(fn):
        batch = rand_batch()
        np.asarray(fn(variables, batch)[0][0, 0])  # warm
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(variables, batch)
        np.asarray(out[0][0, 0])
        return b * args.iters / (time.perf_counter() - t0)

    fps_fp, fps_q8 = timed(fp), timed(q8)
    print(f'det-set agreement (F1 @ IoU>=0.5, same-label): '
          f'{np.mean(f1s):.4f}')
    print(f'matched IoU mean: {np.mean(mious):.4f}   '
          f'score MAD: {np.mean(sdeltas):.5f}')
    print(f'fp  : {fps_fp:.1f} img/s')
    print(f'int8: {fps_q8:.1f} img/s  ({fps_q8 / max(fps_fp, 1e-9):.2f}x)')


if __name__ == '__main__':
    main()
