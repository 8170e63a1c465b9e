"""GenericRoIExtractor (GRoIE) tests: all-level aggregation with learned
pre/post modules, vs the reference configs/groie/ semantics."""
import os

import numpy as np
import jax
import jax.numpy as jnp

import ld_tpu
from ld_tpu import Config
from ld_tpu.models import build_detector

HERE = os.path.dirname(__file__)


def _small_batch(b=2, masks=False):
    rs = np.random.RandomState(0)
    gt = np.zeros((b, 4, 4), np.float32)
    gt[:, 0] = [5, 5, 40, 50]
    gt[:, 1] = [20, 15, 80, 60]
    valid = np.zeros((b, 4), bool)
    valid[:, :2] = True
    batch = dict(
        image=jnp.asarray(rs.randn(b, 64, 96, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, 4), np.int32),
        gt_valid=jnp.asarray(valid),
        img_hw=jnp.asarray([[64., 96.]] * b))
    if masks:
        batch['gt_masks'] = jnp.ones((b, 4, 64, 96), jnp.float32)
    return batch


def test_groie_faster_rcnn_trains_and_tests():
    cfg = Config.fromfile(os.path.join(
        HERE, '..', 'configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py'))
    mc = dict(cfg.model)
    mc['backbone'] = dict(mc['backbone'], depth=18)
    mc['neck'] = dict(mc['neck'], in_channels=[64, 128, 256, 512])
    det = build_detector(mc)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    # the GRoIE pre/post modules own parameters
    rp = v['params']['roi_head']
    assert 'groie' in rp, list(rp)
    assert 'pre' in rp['groie'] and 'post' in rp['groie'], list(rp['groie'])
    losses = det.forward_train(v, _small_batch(),
                               rng=jax.random.PRNGKey(1))
    assert all(np.isfinite(float(x)) for x in losses.values()), losses
    dets, labels, valid = det.forward_test(v, _small_batch())
    assert dets.shape[-1] == 5


def test_groie_uses_all_levels_unlike_single_level_routing():
    """A small roi routes to ONE level in SingleRoIExtractor; GRoIE reads
    every level — perturbing a coarse level must change GRoIE's output and
    leave the routed output untouched."""
    from ld_tpu.models.heads.roi_head import StandardRoIHead

    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.randn(16 // (2 ** l) + 1, 24 // (2 ** l) + 1,
                                  8).astype(np.float32))
             for l in range(4)]
    rois = jnp.asarray([[4., 4., 20., 20.]])   # small: routes to level 0
    valid = jnp.asarray([True])

    plain = StandardRoIHead(bbox_head=dict(num_classes=4, in_channels=8))
    groie = StandardRoIHead(
        bbox_roi_extractor=dict(
            type='GenericRoIExtractor', aggregation='sum',
            roi_layer=dict(output_size=7),
            pre_cfg=dict(type='ConvModule', in_channels=8, out_channels=8,
                         kernel_size=3, padding=1)),
        bbox_head=dict(num_classes=4, in_channels=8))
    gvars = {'params': groie.init_all_variables(jax.random.PRNGKey(0), 8)}

    out_plain = plain._extract_rois({'params': {}}, feats, rois, valid)
    out_groie = groie._extract_rois(gvars, feats, rois, valid)

    feats2 = list(feats)
    feats2[3] = feats2[3] + 100.0   # perturb the coarsest level
    out_plain2 = plain._extract_rois({'params': {}}, feats2, rois, valid)
    out_groie2 = groie._extract_rois(gvars, feats2, rois, valid)

    np.testing.assert_array_equal(np.asarray(out_plain),
                                  np.asarray(out_plain2))
    assert np.abs(np.asarray(out_groie2) -
                  np.asarray(out_groie)).max() > 1e-3


def test_groie_grid_rcnn_builds_and_trains():
    cfg = Config.fromfile(os.path.join(
        HERE, '..',
        'configs/groie/grid_rcnn_r50_fpn_gn-head_groie_1x_coco.py'))
    mc = dict(cfg.model)
    mc['backbone'] = dict(mc['backbone'], depth=18)
    mc['neck'] = dict(mc['neck'], in_channels=[64, 128, 256, 512])
    det = build_detector(mc)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    assert 'groie_grid' in v['params']['roi_head']
    losses = det.forward_train(v, _small_batch(),
                               rng=jax.random.PRNGKey(1))
    assert all(np.isfinite(float(x)) for x in losses.values()), losses


def test_groie_mask_rcnn_builds_and_trains():
    cfg = Config.fromfile(os.path.join(
        HERE, '..', 'configs/groie/mask_rcnn_r50_fpn_groie_1x_coco.py'))
    mc = dict(cfg.model)
    mc['backbone'] = dict(mc['backbone'], depth=18)
    mc['neck'] = dict(mc['neck'], in_channels=[64, 128, 256, 512])
    det = build_detector(mc)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    assert 'groie_mask' in v['params']['roi_head']
    losses = det.forward_train(v, _small_batch(masks=True),
                               rng=jax.random.PRNGKey(1))
    assert 'loss_mask' in losses
    assert all(np.isfinite(float(x)) for x in losses.values()), losses
