"""Optimization smoke for the new head families: a jitted SGD loop on a
fixed synthetic batch must reduce the total loss (gradients flow through
assignment/reweighting machinery end-to-end)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import ld_tpu  # noqa: F401
from ld_tpu.models import build_detector

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m "not slow"


rs = np.random.RandomState(0)
B, G = 1, 4
gt = np.zeros((B, G, 4), np.float32)
gt[:, 0] = [8, 8, 40, 48]
gt[:, 1] = [20, 16, 56, 60]
valid = np.zeros((B, G), bool)
valid[:, :2] = True
BATCH = dict(image=jnp.asarray(rs.randn(B, 64, 64, 3).astype(np.float32)),
             gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((B, G), np.int32),
             gt_valid=jnp.asarray(valid),
             img_hw=jnp.asarray([[64., 64.]] * B))
BASE = dict(
    backbone=dict(type='ResNet', depth=18, frozen_stages=4),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512], out_channels=32,
              start_level=1, add_extra_convs='on_output', num_outs=5),
    test_cfg=dict(nms_pre=50, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=5))


def _converges(cfg, steps=25, lr=0.01):
    det = build_detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = v['params']
    rest = {k: x for k, x in v.items() if k != 'params'}
    # grad clipping: with -log(IoU)-style losses the first steps see huge
    # gradients from degenerate initial boxes (same reason the reference
    # trains with warmup); the smoke only asserts that gradients flow
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.sgd(lr, momentum=0.9))
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def total(p):
            return sum(det.forward_train({**rest, 'params': p},
                                         BATCH).values())
        loss, g = jax.value_and_grad(total)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    first = None
    loss = None
    for i in range(steps):
        params, state, loss = step(params, state)
        if i == 0:
            first = float(loss)
    return first, float(loss)


@pytest.mark.parametrize('head_cfg,name', [
    (dict(type='FSAFHead', num_classes=6, in_channels=32, stacked_convs=1,
          feat_channels=32,
          anchor_generator=dict(octave_base_scale=1, scales_per_octave=1,
                                ratios=[1.0], strides=[8, 16, 32, 64, 128])),
     'FSAF'),
    (dict(type='VFNetHead', num_classes=6, in_channels=32, stacked_convs=1,
          feat_channels=32), 'VFNet'),
    (dict(type='TOODHead', num_classes=6, in_channels=32, stacked_convs=2,
          feat_channels=32), 'TOOD'),
])
def test_new_head_loss_decreases(head_cfg, name):
    cfg = dict(type='RetinaNet', bbox_head=head_cfg, **BASE)
    if name == 'VFNet':
        cfg['train_cfg'] = dict(assigner=dict(type='ATSSAssigner', topk=9))
    first, last = _converges(cfg)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.95, (name, first, last)
