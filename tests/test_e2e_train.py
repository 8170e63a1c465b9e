"""End-to-end training test: a tiny GFL detector overfits synthetic data.

The reference has no train-to-metric test at all (SURVEY.md §4 'NOT
tested'); this exercises the full stack — data loader, assignment, losses,
optimizer with warmup schedule and frozen-backbone masking, pjit step — and
asserts the loss actually decreases.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

import ld_tpu
from ld_tpu.models import build_detector
from ld_tpu.data import SyntheticDetectionDataset, DataLoader
from ld_tpu.parallel import (build_lr_schedule, build_optimizer, create_mesh,
                             create_train_state, jit_train_step,
                             make_train_step, shard_batch)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m "not slow"


def _tiny_cfg():
    return dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='GFLHead', num_classes=4, in_channels=32,
                       stacked_convs=1, feat_channels=32, reg_max=16),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def test_train_loss_decreases():
    det = build_detector(_tiny_cfg())
    mesh = create_mesh(('data', ), devices=jax.devices()[:2])
    ds = SyntheticDetectionDataset(num_images=8, hw=(64, 96), num_classes=4,
                                   max_boxes=3, pipeline=[
        dict(type='Normalize', mean=[0, 0, 0], std=[64, 64, 64],
             to_rgb=False),
        dict(type='Pad', size_divisor=32),
    ])
    loader = DataLoader(ds, batch_size=4, pad_hw=(64, 96), max_gts=4, seed=0)

    schedule = build_lr_schedule(0.02, dict(warmup_iters=5, step=[100]),
                                 steps_per_epoch=2, max_epochs=100)
    variables = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    optimizer = build_optimizer(
        dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4),
        schedule, variables['params'],
        frozen_prefixes=det.frozen_param_paths())
    state = create_train_state(det, jax.random.PRNGKey(0), optimizer,
                               (1, 64, 96, 3))
    frozen_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(),
        state.params['backbone']['layer1_0'])

    step = jit_train_step(make_train_step(det, optimizer), mesh)
    losses = []
    for epoch in range(12):
        loader.set_epoch(epoch)
        for batch in loader:
            batch.pop('img_ids')
            state, metrics = step(state, shard_batch(batch, mesh))
            losses.append(float(metrics['loss']))
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert last < 0.75 * first, (first, last, losses)
    # frozen stage must be bit-identical after training
    frozen_after = state.params['backbone']['layer1_0']
    for a, b in zip(jax.tree_util.tree_leaves(frozen_before),
                    jax.tree_util.tree_leaves(frozen_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trainable parts moved
    head_before = variables['params']['head_net']['gfl_cls']['bias']
    head_after = state.params['head_net']['gfl_cls']['bias']
    assert float(jnp.abs(head_after - head_before).max()) > 0
