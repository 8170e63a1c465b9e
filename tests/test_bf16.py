"""bf16 compute-path tests (the TPU analogue of the reference's fp16
machinery tests, tests/test_fp16.py — SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp

import ld_tpu
from ld_tpu.models import build_detector


def _cfg(dtype):
    return dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True, dtype=dtype),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5, dtype=dtype),
        bbox_head=dict(type='GFLHead', num_classes=4, in_channels=32,
                       stacked_convs=1, feat_channels=32, reg_max=16,
                       dtype=dtype),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def test_bf16_forward_close_to_fp32():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(1, 64, 96, 3).astype(np.float32))
    det32 = build_detector(_cfg(jnp.float32))
    det16 = build_detector(_cfg(jnp.bfloat16))
    v = det32.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    out32 = det32.apply(v, img)
    out16 = det16.apply(v, img)   # same params, bf16 compute
    # params stay fp32; outputs are cast back to fp32
    assert out16[0][0].dtype == jnp.float32
    a = np.asarray(out32[0][0])
    b = np.asarray(out16[0][0])
    # bf16 has ~3 decimal digits; logits live in ~[-5, 1]
    assert np.abs(a - b).max() < 0.15, np.abs(a - b).max()
    # losses stay finite in bf16
    gt = jnp.asarray([[[4., 4., 40., 48.]] + [[0.] * 4] * 3])
    batch = dict(image=img, gt_bboxes=gt,
                 gt_labels=jnp.zeros((1, 4), jnp.int32),
                 gt_valid=jnp.asarray([[True, False, False, False]]),
                 img_hw=jnp.asarray([[64., 96.]]))
    losses = det16.forward_train(v, batch)
    assert all(np.isfinite(float(x)) for x in losses.values())
