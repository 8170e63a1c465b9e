"""Convert Detectron (caffe2) pretrained ResNet checkpoints to ld_tpu.

Parity: /root/reference/tools/model_converters/detectron2pytorch.py.
Detectron stores ResNet-50/101 as caffe2 blob pickles with AffineChannel
layers in place of BN (only `_s` scale and `_b` bias; no running stats —
reconstructed here as mean=0 / var=1, which makes frozen-BN inference
equivalent). Output is the ld_tpu ResNet flax tree
(ld_tpu/models/backbones/resnet.py naming: nested `layer{S}_{B}` blocks
with `conv{i}` / `norm{i}/bn` children), kernels OIHW->HWIO.

Usage:
    python tools/model_converters/detectron2ldtpu.py model.pkl dst.npz 50
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from ld_tpu.utils.checkpoint import save_variables  # noqa: E402

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def convert_detectron_blobs(blobs, depth):
    if depth not in ARCH:
        raise ValueError(f'depth must be one of {sorted(ARCH)}')
    params, batch_stats, used = {}, {}, set()

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def conv(caffe, path):
        put(params, path + ('kernel', ),
            np.transpose(blobs[caffe + '_w'], (2, 3, 1, 0)))
        used.add(caffe + '_w')

    def affine_bn(caffe, path):
        scale = np.asarray(blobs[caffe + '_s'])
        put(params, path + ('bn', 'scale'), scale)
        put(params, path + ('bn', 'bias'), blobs[caffe + '_b'])
        put(batch_stats, path + ('bn', 'mean'), np.zeros_like(scale))
        put(batch_stats, path + ('bn', 'var'), np.ones_like(scale))
        used.update({caffe + '_s', caffe + '_b'})

    conv('conv1', ('conv1', ))
    affine_bn('res_conv1_bn', ('norm1', ))
    for stage, n_blocks in enumerate(ARCH[depth], start=1):
        for b in range(n_blocks):
            block = f'layer{stage}_{b}'
            if b == 0:
                conv(f'res{stage + 1}_{b}_branch1',
                     (block, 'downsample_conv'))
                affine_bn(f'res{stage + 1}_{b}_branch1_bn',
                          (block, 'downsample_norm'))
            for i, letter in enumerate('abc', start=1):
                conv(f'res{stage + 1}_{b}_branch2{letter}',
                     (block, f'conv{i}'))
                affine_bn(f'res{stage + 1}_{b}_branch2{letter}_bn',
                          (block, f'norm{i}'))
    skipped = [k for k in blobs if k not in used]
    return {'params': params, 'batch_stats': batch_stats}, skipped


def main():
    ap = argparse.ArgumentParser(
        description='Detectron caffe2 ResNet pickle -> ld_tpu variables')
    ap.add_argument('src', help='detectron model .pkl')
    ap.add_argument('dst', help='output .npz (load with load_variables)')
    ap.add_argument('depth', type=int, help='ResNet depth (50 or 101)')
    args = ap.parse_args()

    with open(args.src, 'rb') as f:
        data = pickle.load(f, encoding='latin1')
    blobs = data.get('blobs', data)
    variables, skipped = convert_detectron_blobs(blobs, args.depth)
    for key in skipped:
        print(f'not converted: {key}')
    save_variables(args.dst, variables)
    print(f'wrote {args.dst}')


if __name__ == '__main__':
    main()
