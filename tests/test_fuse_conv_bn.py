"""Conv+BN folding (ld_tpu/utils/fuse_conv_bn.py — the reference's
mmcv.cnn.fuse_conv_bn used by tools/test.py --fuse-conv-bn)."""
import pytest

pytestmark = pytest.mark.smoke  # high-value numerics/oracle gate (<10 min total, README)
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401  (registries)
from ld_tpu.models import build_detector
from ld_tpu.utils.fuse_conv_bn import fuse_conv_bn, fuse_conv_bn_cfg_ok


def _detector_cfg():
    return dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, frozen_stages=-1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(
            type='GFLHead', num_classes=4, in_channels=32,
            stacked_convs=1, feat_channels=32, reg_max=8,
            anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                  octave_base_scale=8, scales_per_octave=1,
                                  strides=[8, 16, 32, 64, 128]),
            loss_cls=dict(type='QualityFocalLoss', use_sigmoid=True,
                          beta=2.0, loss_weight=1.0),
            loss_dfl=dict(type='DistributionFocalLoss', loss_weight=0.25),
            loss_bbox=dict(type='GIoULoss', loss_weight=2.0)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def test_fused_forward_identical():
    det = build_detector(_detector_cfg())
    variables = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))

    # make BN stats/affine non-trivial so the fold actually moves numbers
    def perturb(path, x):
        name = '/'.join(
            getattr(p, 'key', getattr(p, 'name', str(p))) for p in path)
        rs = np.random.RandomState(abs(hash(name)) % (2**31))
        if name.endswith('mean') or name.endswith('bias'):
            return x + jnp.asarray(rs.randn(*x.shape).astype(np.float32))
        if name.endswith('var'):
            return x * jnp.asarray(
                (0.5 + rs.rand(*x.shape)).astype(np.float32))
        if name.endswith('scale'):
            return x * jnp.asarray(
                (0.5 + rs.rand(*x.shape)).astype(np.float32))
        return x
    variables = jax.tree_util.tree_map_with_path(perturb, variables)

    fused = fuse_conv_bn(variables)

    # the fold must actually have changed kernels (pairs were found)
    k0 = variables['params']['backbone']['conv1']['kernel']
    k1 = fused['params']['backbone']['conv1']['kernel']
    assert not np.allclose(np.asarray(k0), np.asarray(k1))
    # ... and zeroed the stem BN stats
    assert np.allclose(
        np.asarray(fused['batch_stats']['backbone']['norm1']['bn']['mean']),
        0.0)

    batch = {'image': jnp.asarray(
        np.random.RandomState(1).randn(2, 64, 96, 3).astype(np.float32)),
        'img_hw': jnp.asarray([[64., 96.]] * 2)}
    ref = det.forward_test(variables, batch)
    got = det.forward_test(fused, batch)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_cfg_gate_rejects_convws():
    cfg = _detector_cfg()
    assert fuse_conv_bn_cfg_ok(cfg)
    cfg['backbone']['conv_cfg'] = dict(type='ConvWS')
    assert not fuse_conv_bn_cfg_ok(cfg)


def test_kd_train_step_fused_teacher_identical():
    """Folding the inference-only teacher's BN inside the jitted KD train
    step (apis/train.py fold_teacher_bn, default on) is value-identical:
    loss AND updated student params match the unfused teacher to fp32
    rounding. Reference contract: the teacher runs under no_grad with
    frozen BN (/root/reference/mmdet/models/detectors/kd_one_stage.py:
    69-80), so the fold cannot change any training signal."""
    import optax
    from ld_tpu.parallel.train_step import (create_train_state,
                                            make_train_step)

    cfg = _detector_cfg()
    cfg['bbox_head'].update(
        type='LDHead',
        loss_ld=dict(type='KnowledgeDistillationKLDivLoss',
                     loss_weight=0.25, T=10),
        loss_ld_vlr=dict(type='KnowledgeDistillationKLDivLoss',
                         loss_weight=0.25, T=10),
        loss_kd=dict(type='KnowledgeDistillationKLDivLoss',
                     loss_weight=1.0, T=2))
    cfg['type'] = 'KnowledgeDistillationSingleStageDetector'
    cfg['teacher_config'] = dict(model=_detector_cfg())
    cfg['train_cfg'] = dict(assigner=dict(type='ATSSAssigner', topk=9),
                            allowed_border=-1, pos_weight=-1)
    det = build_detector(cfg)

    opt = optax.sgd(learning_rate=0.05, momentum=0.9)
    state = create_train_state(det, jax.random.PRNGKey(0), opt,
                               input_shape=(1, 64, 96, 3))
    tv = det.init_teacher_variables(jax.random.PRNGKey(1), (1, 64, 96, 3))

    # non-trivial teacher BN stats so the fold actually moves numbers
    def perturb(path, x):
        name = '/'.join(
            getattr(p, 'key', getattr(p, 'name', str(p))) for p in path)
        rs = np.random.RandomState(abs(hash(name)) % (2**31))
        if name.endswith('mean'):
            return x + jnp.asarray(
                0.1 * rs.randn(*x.shape).astype(np.float32))
        if name.endswith('var') or name.endswith('scale'):
            return x * jnp.asarray(
                (0.5 + rs.rand(*x.shape)).astype(np.float32))
        return x
    tv = jax.tree_util.tree_map_with_path(perturb, tv)
    tv_fused = fuse_conv_bn(tv)
    assert not np.allclose(
        np.asarray(tv['params']['backbone']['conv1']['kernel']),
        np.asarray(tv_fused['params']['backbone']['conv1']['kernel']))

    gt = np.zeros((2, 6, 4), np.float32)
    gt[:, 0] = [4, 4, 40, 48]
    gt[:, 1] = [16, 12, 56, 60]
    valid = np.zeros((2, 6), bool)
    valid[:, :2] = True
    batch = {
        'image': jnp.asarray(np.random.RandomState(3).randn(
            2, 64, 96, 3).astype(np.float32)),
        'gt_bboxes': jnp.asarray(gt),
        'gt_labels': jnp.zeros((2, 6), np.int32),
        'gt_valid': jnp.asarray(valid),
        'img_hw': jnp.asarray([[64., 96.]] * 2),
    }

    step = jax.jit(make_train_step(det, opt, has_teacher=True))
    s_ref, m_ref = step(state, batch, tv)
    s_fused, m_fused = step(state, batch, tv_fused)

    for k in m_ref:
        np.testing.assert_allclose(np.asarray(m_ref[k]),
                                   np.asarray(m_fused[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
