#!/usr/bin/env python
"""Export a detector's inference function as serialized StableHLO.

The TPU-native replacement for the reference's ONNX/TensorRT deployment path
(/root/reference/tools/deployment/pytorch2onnx.py, onnx2tensorrt.py,
SURVEY.md §2.4 'out of scope (TPU serving is jit/export instead)'): the
exported artifact is a portable, version-stable StableHLO program that any
XLA runtime (TPU serving, PJRT C API, IFRT) can load and execute —
weights baked in, pre/post-processing (decode + NMS) included.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from ld_tpu import Config
from ld_tpu.apis.inference import init_detector


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344])
    p.add_argument('--out', default='detector_stablehlo.bin')
    args = p.parse_args()

    detector, variables = init_detector(args.config, args.checkpoint)
    h, w = args.shape

    def serve(image, img_hw):
        return detector.forward_test(
            variables, dict(image=image, img_hw=img_hw))

    from jax import export as jax_export
    exported = jax_export.export(jax.jit(serve))(
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 2), jnp.float32))
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    print(f'exported {len(blob)/1e6:.1f} MB StableHLO -> {args.out}')
    print(f'in_avals: {exported.in_avals}')
    print(f'out_avals: {exported.out_avals}')


if __name__ == '__main__':
    main()
