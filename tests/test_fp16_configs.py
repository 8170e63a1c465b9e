"""The fp16 config family must actually lower tower compute to bf16.

The reference's fp16 configs train with fp16 + loss scaling
(/root/reference/configs/fp16/*.py + mmcv Fp16OptimizerHook); the
TPU-native translation is a top-level `dtype = 'bfloat16'` key consumed
by apply_model_dtype (ld_tpu/models/__init__.py): supporting towers
compute in bf16, params/predictions/losses stay fp32, no loss scaling
(bf16 has fp32's exponent range).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ld_tpu import Config
from ld_tpu.models import apply_model_dtype, build_detector

FP16_CONFIGS = [
    'configs/fp16/retinanet_r50_fpn_fp16_1x_coco.py',
    'configs/fp16/faster_rcnn_r50_fpn_fp16_1x_coco.py',
    'configs/fp16/mask_rcnn_r50_fpn_fp16_1x_coco.py',
]


@pytest.mark.parametrize('path', FP16_CONFIGS)
def test_fp16_config_declares_dtype(path):
    cfg = Config.fromfile(path)
    assert cfg.get('dtype') == 'bfloat16'
    mc = apply_model_dtype(dict(cfg.model), cfg['dtype'])
    assert mc['backbone']['dtype'] == jnp.bfloat16
    assert mc['neck']['dtype'] == jnp.bfloat16


def test_apply_model_dtype_respects_explicit_and_unsupported():
    mc = dict(
        backbone=dict(type='ResNet', depth=18, dtype=jnp.float32),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        bbox_head=dict(type='GFLHead', num_classes=4, in_channels=32))
    out = apply_model_dtype(mc, 'bfloat16')
    # explicit per-module dtype wins
    assert out['backbone']['dtype'] == jnp.float32
    assert out['neck']['dtype'] == jnp.bfloat16
    assert out['bbox_head']['dtype'] == jnp.bfloat16
    # input dict untouched
    assert 'dtype' not in mc['neck']


def test_fp16_forward_runs_and_predictions_fp32():
    cfg = Config.fromfile('configs/fp16/retinanet_r50_fpn_fp16_1x_coco.py')
    mc = dict(cfg.model)
    mc['backbone'] = dict(mc['backbone'], depth=18, base_channels=16)
    mc['neck'] = dict(mc['neck'], in_channels=[16, 32, 64, 128],
                      out_channels=32)
    mc['bbox_head'] = dict(mc['bbox_head'], in_channels=32,
                           feat_channels=32, stacked_convs=1)
    det = build_detector(mc, dtype=cfg['dtype'])
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    # params stay fp32 even though compute is bf16
    leaves = jax.tree_util.tree_leaves(v['params'])
    assert all(l.dtype == jnp.float32 for l in leaves)
    batch = dict(
        image=jnp.asarray(np.random.RandomState(0)
                          .randn(1, 64, 96, 3), jnp.float32),
        img_hw=jnp.asarray([[64., 96.]]),
        scale_factor=jnp.ones((1, 4)))
    dets, labels, valid = jax.jit(
        lambda vv, b: det.forward_test(vv, b, rescale=False))(v, batch)
    assert dets.dtype == jnp.float32
    assert np.isfinite(np.asarray(dets)).all()
