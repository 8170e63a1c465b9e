"""Backbone plugins (GCNet ContextBlock, GeneralizedAttention) + ConvWS/GN.

Covers VERDICT round-1 item 4: configs build (test_config_zoo), numerics
oracles for the new modules, one train step runs, dp8 == dp1 for a plugged
model.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

import ld_tpu
from ld_tpu.models import build_detector
from ld_tpu.utils.registry import BACKBONES
from ld_tpu.parallel import (build_lr_schedule, build_optimizer, create_mesh,
                             create_train_state, jit_train_step,
                             make_train_step, shard_batch)


def test_context_block_matches_numpy_oracle():
    from ld_tpu.models.backbones.plugins import ContextBlock
    rs = np.random.RandomState(0)
    x = rs.randn(2, 5, 7, 16).astype(np.float32)
    blk = ContextBlock(ratio=0.25)
    v = blk.init(jax.random.PRNGKey(3), jnp.asarray(x))
    got = np.asarray(blk.apply(v, jnp.asarray(x)))

    p = jax.tree_util.tree_map(np.asarray, v['params'])
    b, h, w, c = x.shape
    # attention pooling: softmax over HW of a 1x1 conv -> weighted sum
    logits = x @ p['conv_mask']['kernel'][0, 0] + p['conv_mask']['bias']
    a = logits.reshape(b, h * w)
    a = np.exp(a - a.max(1, keepdims=True))
    a = a / a.sum(1, keepdims=True)
    ctx = np.einsum('bp,bpc->bc', a, x.reshape(b, h * w, c))
    # channel transform: 1x1 -> LN -> relu -> 1x1 (zero-init)
    t = ctx @ p['channel_add_conv0']['kernel'][0, 0] + \
        p['channel_add_conv0']['bias']
    mu, var = t.mean(-1, keepdims=True), t.var(-1, keepdims=True)
    t = (t - mu) / np.sqrt(var + 1e-5)
    t = t * p['channel_add_ln']['scale'] + p['channel_add_ln']['bias']
    t = np.maximum(t, 0)
    t = t @ p['channel_add_conv1']['kernel'][0, 0] + \
        p['channel_add_conv1']['bias']
    want = x + t[:, None, None, :]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # zero-init last conv: block is identity at init
    np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-6)


def test_convws_matches_torch():
    from ld_tpu.models.layers import ConvWS
    rs = np.random.RandomState(1)
    x = rs.randn(2, 9, 11, 8).astype(np.float32)
    m = ConvWS(12, (3, 3), padding=1, use_bias=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(v, jnp.asarray(x)))

    k = np.asarray(v['params']['kernel'])          # HWIO
    bias = np.asarray(v['params']['bias'])
    tw = torch.from_numpy(k.transpose(3, 2, 0, 1))  # OIHW
    # mmcv conv_ws_2d: per-out-channel mean/std (unbiased) over (I, H, W)
    flat = tw.reshape(tw.size(0), -1)
    tw = (tw - flat.mean(1).view(-1, 1, 1, 1)) / \
        (flat.std(1).view(-1, 1, 1, 1) + 1e-5)
    want = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), tw,
                    torch.from_numpy(bias), padding=1)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-5)


def test_generalized_attention_identity_at_init():
    from ld_tpu.models.backbones.plugins import GeneralizedAttention
    rs = np.random.RandomState(2)
    x = rs.randn(1, 8, 10, 32).astype(np.float32)
    for at in ('0010', '1111', '1000', '0001'):
        blk = GeneralizedAttention(num_heads=8, attention_type=at,
                                   kv_stride=2)
        v = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = np.asarray(blk.apply(v, jnp.asarray(x)))
        # gamma zero-init -> exact identity at init (reference semantics)
        np.testing.assert_array_equal(out, x)
        # with a non-zero gamma the block must actually transform
        v2 = jax.tree_util.tree_map(lambda a: a, v)
        v2 = {'params': dict(v2['params'])}
        v2['params']['gamma'] = jnp.ones((1, ))
        out2 = np.asarray(blk.apply(v2, jnp.asarray(x)))
        assert np.abs(out2 - x).max() > 0, at
        assert np.isfinite(out2).all(), at


def _plugged_cfg():
    return dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=50, frozen_stages=1,
                      norm_eval=True,
                      plugins=[
                          dict(cfg=dict(type='ContextBlock', ratio=1. / 4),
                               stages=(False, True, True, True),
                               position='after_conv3'),
                          dict(cfg=dict(type='GeneralizedAttention',
                                        spatial_range=-1, num_heads=8,
                                        attention_type='0010', kv_stride=2),
                               stages=(False, False, True, True),
                               position='after_conv2'),
                      ]),
        neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='GFLHead', num_classes=4, in_channels=32,
                       stacked_convs=1, feat_channels=32, reg_max=16),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def _batch(b=8):
    rs = np.random.RandomState(0)
    gt = np.zeros((b, 4, 4), np.float32)
    gt[:, 0] = [4, 4, 40, 48]
    gt[:, 1] = [16, 12, 56, 60]
    valid = np.zeros((b, 4), bool)
    valid[:, :2] = True
    return {
        'image': rs.randn(b, 64, 96, 3).astype(np.float32),
        'gt_bboxes': gt,
        'gt_labels': np.zeros((b, 4), np.int32),
        'gt_valid': valid,
        'img_hw': np.tile([[64., 96.]], (b, 1)).astype(np.float32),
    }


def test_plugged_model_dp8_matches_dp1():
    assert len(jax.devices()) >= 8

    def run(n_devices, n_steps=2):
        det = build_detector(_plugged_cfg())
        mesh = create_mesh(('data', ), devices=jax.devices()[:n_devices])
        schedule = build_lr_schedule(0.01, dict(warmup_iters=2, step=[100]),
                                    2, 10)
        variables = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
        optimizer = build_optimizer(
            dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=1e-4),
            schedule, variables['params'],
            frozen_prefixes=det.frozen_param_paths())
        state = create_train_state(det, jax.random.PRNGKey(0), optimizer,
                                   (1, 64, 96, 3))
        step = jit_train_step(make_train_step(det, optimizer), mesh)
        losses = []
        for _ in range(n_steps):
            state, metrics = step(state, shard_batch(_batch(), mesh))
            losses.append(float(metrics['loss']))
        assert all(np.isfinite(l) for l in losses), losses
        return losses

    np.testing.assert_allclose(run(1), run(8), rtol=3e-4, atol=3e-5)


def test_gnws_faster_rcnn_train_step():
    """The gn+ws recipe end-to-end: ConvWS+GN backbone/neck/head, one
    forward_train with finite losses (reference configs/gn+ws)."""
    from ld_tpu import Config
    import os
    cfg = Config.fromfile(os.path.join(
        os.path.dirname(__file__), '..',
        'configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py'))
    mc = dict(cfg.model)
    mc['backbone'] = dict(mc['backbone'], depth=50)
    det = build_detector(mc)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    # GN everywhere in the backbone: no BN running stats
    assert not v.get('batch_stats'), list(v.get('batch_stats', {}))
    b = _batch(2)
    losses = det.forward_train(v, {k: jnp.asarray(x) for k, x in b.items()},
                               rng=jax.random.PRNGKey(1))
    assert all(np.isfinite(float(x)) for x in losses.values()), losses
