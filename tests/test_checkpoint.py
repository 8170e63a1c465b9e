"""Checkpoint conversion & persistence tests."""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

import ld_tpu
from ld_tpu.models import build_detector
from ld_tpu.utils.checkpoint import (convert_torch_state_dict,
                                     load_variables, save_variables)


def _gfl_r18_cfg():
    return dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=256, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='GFLHead', num_classes=80, in_channels=256,
                       stacked_convs=4, feat_channels=256, reg_max=16),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def _torch_style_state_dict(det, variables):
    """Build an mmdet-GFL-style state dict with shapes matching the model
    (random values) — exercises every mapping rule."""
    sd = {}

    def conv(hwio):
        h, w, i, o = hwio
        return np.random.randn(o, i, h, w).astype(np.float32)

    p = variables['params']
    sd['backbone.conv1.weight'] = conv(p['backbone']['conv1'][
        'kernel'].shape)
    for leaf, tleaf in [('scale', 'weight'), ('bias', 'bias')]:
        sd[f'backbone.bn1.{tleaf}'] = np.random.randn(64).astype(np.float32)
    sd['backbone.bn1.running_mean'] = np.zeros(64, np.float32)
    sd['backbone.bn1.running_var'] = np.ones(64, np.float32)
    for name, sub in p['backbone'].items():
        if not name.startswith('layer'):
            continue
        s, b = name[5:].split('_')
        for cname, csub in sub.items():
            if cname.startswith('conv'):
                sd[f'backbone.layer{s}.{b}.{cname}.weight'] = conv(
                    csub['kernel'].shape)
            elif cname.startswith('norm'):
                i = cname[-1]
                c = csub['bn']['scale'].shape[0]
                sd[f'backbone.layer{s}.{b}.bn{i}.weight'] = np.random.randn(
                    c).astype(np.float32)
                sd[f'backbone.layer{s}.{b}.bn{i}.bias'] = np.random.randn(
                    c).astype(np.float32)
                sd[f'backbone.layer{s}.{b}.bn{i}.running_mean'] = np.zeros(
                    c, np.float32)
                sd[f'backbone.layer{s}.{b}.bn{i}.running_var'] = np.ones(
                    c, np.float32)
            elif cname == 'downsample_conv':
                sd[f'backbone.layer{s}.{b}.downsample.0.weight'] = conv(
                    csub['kernel'].shape)
            elif cname == 'downsample_norm':
                c = csub['bn']['scale'].shape[0]
                sd[f'backbone.layer{s}.{b}.downsample.1.weight'] = \
                    np.random.randn(c).astype(np.float32)
                sd[f'backbone.layer{s}.{b}.downsample.1.bias'] = \
                    np.random.randn(c).astype(np.float32)
                sd[f'backbone.layer{s}.{b}.downsample.1.running_mean'] = \
                    np.zeros(c, np.float32)
                sd[f'backbone.layer{s}.{b}.downsample.1.running_var'] = \
                    np.ones(c, np.float32)
    for i in range(3):
        k = p['neck'][f'lateral_{i}']['kernel'].shape
        sd[f'neck.lateral_convs.{i}.conv.weight'] = conv(k)
        sd[f'neck.lateral_convs.{i}.conv.bias'] = np.zeros(k[-1], np.float32)
        k = p['neck'][f'fpn_conv_{i}']['kernel'].shape
        sd[f'neck.fpn_convs.{i}.conv.weight'] = conv(k)
        sd[f'neck.fpn_convs.{i}.conv.bias'] = np.zeros(k[-1], np.float32)
    for j in range(2):
        k = p['neck'][f'fpn_extra_{j}']['kernel'].shape
        sd[f'neck.fpn_convs.{3 + j}.conv.weight'] = conv(k)
        sd[f'neck.fpn_convs.{3 + j}.conv.bias'] = np.zeros(k[-1], np.float32)
    for kind in ('cls', 'reg'):
        for i in range(4):
            k = p['head_net'][f'{kind}_conv{i}']['Conv_0']['kernel'].shape
            sd[f'bbox_head.{kind}_convs.{i}.conv.weight'] = conv(k)
            c = k[-1]
            sd[f'bbox_head.{kind}_convs.{i}.gn.weight'] = np.ones(
                c, np.float32)
            sd[f'bbox_head.{kind}_convs.{i}.gn.bias'] = np.zeros(
                c, np.float32)
    for name in ('gfl_cls', 'gfl_reg'):
        k = p['head_net'][name]['kernel'].shape
        sd[f'bbox_head.{name}.weight'] = conv(k)
        sd[f'bbox_head.{name}.bias'] = np.zeros(k[-1], np.float32)
    for i in range(5):
        sd[f'bbox_head.scales.{i}.scale'] = np.float32(1.0 + 0.1 * i)
    return sd


def test_torch_conversion_structural_match():
    det = build_detector(_gfl_r18_cfg())
    variables = det.init_variables(jax.random.PRNGKey(0), (1, 64, 64, 3))
    sd = _torch_style_state_dict(det, variables)
    converted = convert_torch_state_dict(sd)
    assert converted['_unmapped'] == [], converted['_unmapped']
    converted.pop('_unmapped')

    want_paths = {
        '/'.join(str(getattr(q, 'key', q)) for q in kp)
        for kp, _ in jax.tree_util.tree_leaves_with_path(variables)
    }
    got_paths = {
        '/'.join(str(getattr(q, 'key', q)) for q in kp)
        for kp, _ in jax.tree_util.tree_leaves_with_path(converted)
    }
    assert got_paths == want_paths, (
        sorted(want_paths - got_paths)[:5], sorted(got_paths - want_paths)[:5])
    # shapes agree leaf-by-leaf
    jax.tree_util.tree_map(lambda a, b: None if a.shape == b.shape else
                           (_ for _ in ()).throw(AssertionError((a.shape,
                                                                 b.shape))),
                           variables, converted)
    # scales mapped positionally
    np.testing.assert_allclose(converted['params']['head_net']['scales'],
                               [1.0, 1.1, 1.2, 1.3, 1.4], rtol=1e-6)
    # converted tree actually runs
    out = det.apply(converted, jnp.zeros((1, 64, 64, 3)))
    assert len(out[0]) == 5


def test_variables_npz_roundtrip():
    det = build_detector(_gfl_r18_cfg())
    variables = det.init_variables(jax.random.PRNGKey(0), (1, 64, 64, 3))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'v.npz')
        save_variables(path, variables)
        loaded = load_variables(path)
    before = jax.tree_util.tree_leaves(variables)
    after = jax.tree_util.tree_leaves(loaded)
    assert len(before) == len(after)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
