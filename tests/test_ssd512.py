"""SSD512: 7-level VGG extras + the COCO 0.1-0.9 anchor recipe.

Parity: /root/reference/configs/ssd/ssd512_coco.py,
mmdet/core/anchor/anchor_generator.py:388 (hard-coded first-level sizes),
mmdet/models/backbones/ssd_vgg.py (input_size==512 extra setting + final
4x4 conv collapsing 2x2 -> 1x1).
"""
import jax
import jax.numpy as jnp
import numpy as np

import ld_tpu  # noqa: F401
from ld_tpu import Config
from ld_tpu.models import build_detector
from ld_tpu.models.heads.ssd_head import SSDAnchorGenerator


def test_ssd512_anchor_sizes_match_mmdet():
    ag = SSDAnchorGenerator(
        strides=[8, 16, 32, 64, 128, 256, 512],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]],
        input_size=512, basesize_ratio_range=(0.1, 0.9))
    assert ag.min_sizes == [20, 51, 133, 215, 296, 378, 460]
    assert ag.max_sizes == [51, 133, 215, 296, 378, 460, 542]
    # per-level anchor counts: 2 + 2*len(ratios)
    assert [a.shape[0] for a in ag.base_anchors] == [4, 6, 6, 6, 6, 4, 4]


def test_ssd512_config_builds_with_7_levels():
    cfg = Config.fromfile('configs/ssd/ssd512_coco.py')
    m = dict(cfg.model)
    m.setdefault('train_cfg', cfg.model.get('train_cfg'))
    m.setdefault('test_cfg', cfg.model.get('test_cfg'))
    det = build_detector(m)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 512, 512, 3))
    bvars = {'params': v['params']['backbone']}
    bs = v.get('batch_stats', {}).get('backbone')
    if bs:
        bvars['batch_stats'] = bs
    feats = det.backbone.apply(bvars, jnp.zeros((1, 512, 512, 3)))
    assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4, 2, 1]
    assert [f.shape[-1] for f in feats] == \
        [512, 1024, 512, 256, 256, 256, 256]
    batch = dict(image=jnp.zeros((1, 512, 512, 3)),
                 gt_bboxes=jnp.asarray([[[5., 5., 80., 90.]]]),
                 gt_labels=jnp.zeros((1, 1), np.int32),
                 gt_valid=jnp.ones((1, 1), bool),
                 img_hw=jnp.asarray([[512., 512.]]))
    losses = det.forward_train(v, batch)
    assert all(np.isfinite(float(x)) for x in losses.values())
