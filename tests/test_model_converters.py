"""Model-converter tools: pycls RegNet / Detectron ResNet / v1 upgrade.

Each converter is validated by inverse construction: take the ld_tpu
backbone's init tree, rename every leaf back to the SOURCE framework's
naming, convert, and require the result to reproduce the init tree's
structure, shapes, and (transposed) values exactly.
"""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools',
                                'model_converters'))

from regnet2ldtpu import convert_pycls_state  # noqa: E402
from detectron2ldtpu import convert_detectron_blobs  # noqa: E402
from upgrade_model_version import (bg_first_to_last, drop_bg_reg_group,
                                   upgrade_state_dict)  # noqa: E402


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k, )))
        else:
            out[prefix + (k, )] = np.asarray(v)
    return out


def _hwio_to_oihw(w):
    return np.transpose(w, (3, 2, 0, 1))


def test_regnet_converter_roundtrip():
    from ld_tpu.models.backbones import RegNet
    net = RegNet(arch='regnetx_400mf', out_indices=(0, 1, 2, 3),
                 frozen_stages=-1, norm_eval=False)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)), train=False)
    want = {c: _flatten(variables[c]) for c in ('params', 'batch_stats')}

    letters = {1: 'a', 2: 'b', 3: 'c'}
    bn_leaf = {'scale': 'weight', 'bias': 'bias', 'mean': 'running_mean',
               'var': 'running_var'}
    blobs = {}
    for coll in ('params', 'batch_stats'):
        for path, val in want[coll].items():
            name = path[0]
            if name == 'conv1':
                blobs['stem.conv.weight'] = _hwio_to_oihw(val)
            elif name == 'norm1':
                blobs[f'stem.bn.{bn_leaf[path[-1]]}'] = val
            elif name.endswith('_downsample_conv'):
                s, b = name.split('_')[0][5:], name.split('_')[1]
                blobs[f's{s}.b{int(b) + 1}.proj.weight'] = _hwio_to_oihw(val)
            elif name.endswith('_downsample_norm'):
                s, b = name.split('_')[0][5:], name.split('_')[1]
                blobs[f's{s}.b{int(b) + 1}.bn.{bn_leaf[path[-1]]}'] = val
            elif '_conv' in name:
                s, b, c = name.split('_')
                blobs[f's{s[5:]}.b{int(b) + 1}.f.{letters[int(c[4:])]}' \
                      '.weight'] = _hwio_to_oihw(val)
            elif '_norm' in name:
                s, b, c = name.split('_')
                blobs[f's{s[5:]}.b{int(b) + 1}.f.{letters[int(c[4:])]}_bn.' \
                      f'{bn_leaf[path[-1]]}'] = val
            else:
                raise AssertionError(name)
    blobs['head.fc.weight'] = np.zeros((1000, 8))  # classifier: dropped

    got, skipped = convert_pycls_state(blobs)
    assert skipped == ['head.fc.weight']
    for coll in ('params', 'batch_stats'):
        got_flat = _flatten(got[coll])
        assert set(got_flat) == set(want[coll])
        for path in got_flat:
            np.testing.assert_array_equal(got_flat[path], want[coll][path])


def test_detectron_converter_roundtrip():
    from ld_tpu.models.backbones import ResNet
    net = ResNet(depth=50, out_indices=(0, 1, 2, 3), frozen_stages=-1,
                 norm_eval=False)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)), train=False)
    want_params = _flatten(variables['params'])

    blobs, letters = {}, {1: 'a', 2: 'b', 3: 'c'}
    for path, val in want_params.items():
        if path == ('conv1', 'kernel'):
            blobs['conv1_w'] = _hwio_to_oihw(val)
        elif path[0] == 'norm1':
            blobs['res_conv1_bn_s' if path[-1] == 'scale'
                  else 'res_conv1_bn_b'] = val
        else:
            block = path[0]                      # layer{S}_{B}
            s, b = block[5:].split('_')
            stage = int(s) + 1
            if path[1] == 'downsample_conv':
                blobs[f'res{stage}_{b}_branch1_w'] = _hwio_to_oihw(val)
            elif path[1] == 'downsample_norm':
                suffix = '_s' if path[-1] == 'scale' else '_b'
                blobs[f'res{stage}_{b}_branch1_bn{suffix}'] = val
            elif path[1].startswith('conv'):
                letter = letters[int(path[1][4:])]
                blobs[f'res{stage}_{b}_branch2{letter}_w'] = \
                    _hwio_to_oihw(val)
            elif path[1].startswith('norm'):
                letter = letters[int(path[1][4:])]
                suffix = '_s' if path[-1] == 'scale' else '_b'
                blobs[f'res{stage}_{b}_branch2{letter}_bn{suffix}'] = val
            else:
                raise AssertionError(path)

    got, skipped = convert_detectron_blobs(blobs, 50)
    assert not skipped
    got_params = _flatten(got['params'])
    assert set(got_params) == set(want_params)
    for path in got_params:
        np.testing.assert_array_equal(got_params[path], want_params[path])
    # affine-channel reconstruction: frozen stats are identity
    for path, val in _flatten(got['batch_stats']).items():
        expected = 0.0 if path[-1] == 'mean' else 1.0
        np.testing.assert_array_equal(val, np.full_like(val, expected))


def test_upgrade_v1_channel_surgery():
    num_classes = 5  # incl. background (v1 convention)
    # fc_cls: background-first -> background-last
    w = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    up = bg_first_to_last(w, num_classes)
    np.testing.assert_array_equal(up[:4], w[1:])
    np.testing.assert_array_equal(up[4], w[0])
    # per-anchor conv (2 anchors x 5 classes): groups roll independently
    w = np.arange(10 * 2, dtype=np.float32).reshape(10, 2, 1, 1)
    up = bg_first_to_last(w, num_classes)
    np.testing.assert_array_equal(up.reshape(2, 5, 2)[:, :4],
                                  w.reshape(2, 5, 2)[:, 1:])
    # class-aware reg drops the bg 4-vector group
    w = np.arange(20 * 7, dtype=np.float32).reshape(20, 7)
    up = drop_bg_reg_group(w, num_classes)
    assert up.shape == (16, 7)
    np.testing.assert_array_equal(up, w[4:])
    # two-stage head nesting + sigmoid heads untouched
    sd = {'bbox_head.fc_cls.bias': np.arange(5, dtype=np.float32),
          'backbone.conv1.weight': np.ones((4, 3, 7, 7), np.float32)}
    out = upgrade_state_dict(sd, num_classes=num_classes, two_stage=True)
    assert 'roi_head.bbox_head.fc_cls.bias' in out
    np.testing.assert_array_equal(out['backbone.conv1.weight'],
                                  sd['backbone.conv1.weight'])
    np.testing.assert_array_equal(
        out['roi_head.bbox_head.fc_cls.bias'],
        np.array([1, 2, 3, 4, 0], np.float32))
