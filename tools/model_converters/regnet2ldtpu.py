"""Convert pycls pretrained RegNet checkpoints to ld_tpu variables.

Parity: /root/reference/tools/model_converters/regnet2mmdet.py (pure key
renamer pycls->mmdet). Here the target is the ld_tpu flax tree directly
(ld_tpu/models/backbones/regnet.py naming: flat `layer{S}_{B}_conv{i}` /
`layer{S}_{B}_norm{i}` modules, `conv1`/`norm1` stem), with OIHW->HWIO
kernel transposition and BN running stats routed into `batch_stats`.

pycls naming (github.com/facebookresearch/pycls):
    stem.conv.weight, stem.bn.{weight,bias,running_mean,running_var}
    s{S}.b{B}.proj.weight + s{S}.b{B}.bn.*          (B==1 downsample)
    s{S}.b{B}.f.{a,b,c}.weight + f.{a,b,c}_bn.*     (bottleneck 1x1/3x3/1x1)
    head.fc.{weight,bias}                           (classifier -- dropped)

Usage:
    python tools/model_converters/regnet2ldtpu.py src.pyth dst.npz
"""
import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from ld_tpu.utils.checkpoint import save_variables  # noqa: E402

_BOTTLENECK = {'a': 1, 'b': 2, 'c': 3}


def _oihw_to_hwio(w):
    return np.transpose(w, (2, 3, 1, 0))


def convert_pycls_state(blobs):
    """pycls model_state -> {'params': ..., 'batch_stats': ...} for the
    ld_tpu RegNet backbone. Returns (variables, skipped_keys)."""
    params, batch_stats, skipped = {}, {}, []

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def put_bn(module, leaf, value):
        tgt = {'weight': (params, 'scale'), 'bias': (params, 'bias'),
               'running_mean': (batch_stats, 'mean'),
               'running_var': (batch_stats, 'var')}.get(leaf)
        if tgt is None:  # num_batches_tracked
            return
        tree, name = tgt
        put(tree, (module, 'bn', name), value)

    for key, val in blobs.items():
        val = np.asarray(val)
        if key == 'stem.conv.weight':
            put(params, ('conv1', 'kernel'), _oihw_to_hwio(val))
            continue
        m = re.match(r'stem\.bn\.(\w+)$', key)
        if m:
            put_bn('norm1', m.group(1), val)
            continue
        m = re.match(r's(\d+)\.b(\d+)\.(.+)$', key)
        if m:
            stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            pre = f'layer{stage}_{block - 1}'
            if rest == 'proj.weight':
                put(params, (f'{pre}_downsample_conv', 'kernel'),
                    _oihw_to_hwio(val))
                continue
            bm = re.match(r'bn\.(\w+)$', rest)
            if bm:
                put_bn(f'{pre}_downsample_norm', bm.group(1), val)
                continue
            fm = re.match(r'f\.([abc])\.weight$', rest)
            if fm:
                put(params, (f'{pre}_conv{_BOTTLENECK[fm.group(1)]}',
                             'kernel'), _oihw_to_hwio(val))
                continue
            fm = re.match(r'f\.([abc])_bn\.(\w+)$', rest)
            if fm:
                put_bn(f'{pre}_norm{_BOTTLENECK[fm.group(1)]}',
                       fm.group(2), val)
                continue
        skipped.append(key)
    return {'params': params, 'batch_stats': batch_stats}, skipped


def main():
    ap = argparse.ArgumentParser(
        description='pycls RegNet checkpoint -> ld_tpu variables (.npz)')
    ap.add_argument('src', help='pycls .pyth checkpoint')
    ap.add_argument('dst', help='output .npz (load with load_variables)')
    args = ap.parse_args()

    import torch
    ckpt = torch.load(args.src, map_location='cpu', weights_only=False)
    blobs = ckpt.get('model_state', ckpt)
    blobs = {k: (v.numpy() if hasattr(v, 'numpy') else v)
             for k, v in blobs.items()}
    variables, skipped = convert_pycls_state(blobs)
    for key in skipped:
        if not (key.startswith('head.') or 'num_batches_tracked' in key):
            print(f'not converted: {key}')
    save_variables(args.dst, variables)
    print(f'wrote {args.dst}')


if __name__ == '__main__':
    main()
