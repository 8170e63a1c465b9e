"""Long-tail odds and ends: SCNet, RLE, datasets, legacy anchors, gated
pipeline bridges."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m "not slow"



def test_rle_roundtrip():
    from ld_tpu.evaluation.segm_eval import (encode_mask_results,
                                             rle_decode, rle_encode)
    rs = np.random.RandomState(0)
    for shape in ((17, 23), (1, 1), (5, 40)):
        m = (rs.rand(*shape) > 0.5).astype(np.uint8)
        assert (rle_decode(rle_encode(m)) == m).all()
    enc = encode_mask_results([[np.ones((4, 4), np.uint8)], []])
    assert enc[0][0]['size'] == [4, 4] and enc[1] == []


def test_extra_datasets_registered():
    from ld_tpu.utils.registry import DATASETS
    for name in ('CityscapesDataset', 'DeepFashionDataset',
                 'WIDERFaceDataset'):
        assert name in DATASETS
    from ld_tpu.data.extra_datasets import (CityscapesDataset,
                                            WIDERFaceDataset)
    assert len(CityscapesDataset.CLASSES) == 8
    assert WIDERFaceDataset.CLASSES == ('face', )


def test_legacy_anchor_generator():
    from ld_tpu.ops import AnchorGenerator, LegacyAnchorGenerator
    legacy = LegacyAnchorGenerator(strides=[8], ratios=[1.0], scales=[8])
    new = AnchorGenerator(strides=[8], ratios=[1.0], scales=[8])
    la = np.asarray(legacy.grid_anchors([(2, 2)])[0])
    na = np.asarray(new.grid_anchors([(2, 2)])[0])
    # legacy corners are quantized and offset by the (size-1) convention
    assert not np.allclose(la, na)
    assert np.allclose(la, np.round(la))


def test_albu_instaboost_gated():
    from ld_tpu.utils.registry import PIPELINES
    assert 'Albu' in PIPELINES and 'InstaBoost' in PIPELINES
    with pytest.raises(ImportError):
        PIPELINES.build(dict(type='Albu', transforms=[]))
    with pytest.raises(ImportError):
        PIPELINES.build(dict(type='InstaBoost'))


def test_scnet_roi_head():
    rs = np.random.RandomState(0)
    B, G = 1, 4
    H, W = 64, 64
    gt = np.zeros((B, G, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 48]
    valid = np.zeros((B, G), bool)
    valid[:, 0] = True
    masks = np.zeros((B, G, H // 4, W // 4), np.float32)
    masks[0, 0, 2:12, 2:10] = 1.0
    batch = dict(
        image=jnp.asarray(rs.randn(B, H, W, 3).astype(np.float32)),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
        gt_valid=jnp.asarray(valid), gt_masks=jnp.asarray(masks),
        img_hw=jnp.asarray([[float(H), float(W)]] * B))
    cfg = dict(
        type='SCNet',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=32, feat_channels=32),
        roi_head=dict(
            type='SCNetRoIHead', num_stages=2,
            stage_loss_weights=(1.0, 0.5),
            bbox_head=dict(num_classes=6, in_channels=32,
                           fc_out_channels=64),
            mask_head=dict(num_convs=1, conv_out_channels=32, roi_size=7),
            semantic_head=dict(num_classes=2, conv_out_channels=32),
            bbox_roi_extractor=dict(featmap_strides=[4, 8, 16, 32]),
            train_cfg=[dict(sampler=dict(num=32))] * 2),
        test_cfg=dict(rpn=dict(nms_pre=100, max_per_img=50),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10)))
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, H, W, 3))
    assert 'glbctx' in v['params']['roi_head']
    losses = det.forward_train(v, batch, jax.random.PRNGKey(1))
    assert 'loss_glbctx' in losses
    assert all(np.isfinite(float(x)) for x in losses.values())


def test_cityscapes_converter(tmp_path):
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tools', 'dataset_converters'))
    import cityscapes as cs
    from PIL import Image
    d = str(tmp_path)
    city = 'ctown'
    os.makedirs(f'{d}/leftImg8bit/val/{city}')
    os.makedirs(f'{d}/gtFine/val/{city}')
    inst = np.zeros((64, 96), np.int32)
    inst[10:30, 10:40] = 26 * 1000      # car
    inst[40:60, 50:90] = 24 * 1000 + 1  # person
    Image.fromarray(inst).save(
        f'{d}/gtFine/val/{city}/f_gtFine_instanceIds.png')
    Image.fromarray(np.zeros((64, 96, 3), np.uint8)).save(
        f'{d}/leftImg8bit/val/{city}/f_leftImg8bit.png')
    coco = cs.collect_split(d, 'val')
    assert len(coco['images']) == 1 and len(coco['annotations']) == 2
    names = {c['id']: c['name'] for c in coco['categories']}
    assert sorted(names[a['category_id']]
                  for a in coco['annotations']) == ['car', 'person']
