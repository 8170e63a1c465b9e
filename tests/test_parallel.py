"""SPMD correctness: the 8-device data-parallel step must match 1-device.

This is the TPU equivalent of validating the reference's DDP + reduce_mean
wiring (dist_utils.py:63) — which the reference never tests (SURVEY.md §4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ld_tpu
from ld_tpu.models import build_detector
from ld_tpu.parallel import (build_lr_schedule, build_optimizer, create_mesh,
                             create_train_state, jit_train_step,
                             make_train_step, shard_batch, frozen_mask)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m "not slow"


def _cfg():
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


def _run_steps(n_devices, n_steps=3):
    det = build_detector(_cfg())
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
    return losses, state


def test_dp8_matches_dp1():
    assert len(jax.devices()) >= 8, 'conftest must force 8 CPU devices'
    l1, s1 = _run_steps(1)
    l8, s8 = _run_steps(8)
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=2e-5)
    # final params agree across the two worlds (compare on host: the arrays
    # live on different device sets)
    p1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s1.params)]
    p8 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s8.params)]
    worst = max(float(np.abs(a - b).max()) for a, b in zip(p1, p8))
    assert worst < 1e-4, worst


def test_remat_step_is_exact():
    # jax.checkpoint rematerialization must not change the optimization
    det = build_detector(_cfg())
    mesh = create_mesh(('data', ), devices=jax.devices()[:1])
    variables = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    import optax
    opt = optax.sgd(0.01, momentum=0.9)
    state0 = create_train_state(det, jax.random.PRNGKey(0), opt,
                                (1, 64, 96, 3))
    batch = shard_batch(_batch(), mesh)
    s_exact, m_exact = jit_train_step(make_train_step(det, opt), mesh)(
        state0, batch)
    state0 = create_train_state(det, jax.random.PRNGKey(0), opt,
                                (1, 64, 96, 3))
    s_remat, m_remat = jit_train_step(
        make_train_step(det, opt, remat=True), mesh)(state0, batch)
    np.testing.assert_allclose(float(m_exact['loss']),
                               float(m_remat['loss']), rtol=1e-6)
    worst = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(s_exact.params),
                                jax.tree_util.tree_leaves(s_remat.params)))
    assert worst < 1e-6, worst


def test_device_prefetch_order_and_content():
    from ld_tpu.parallel import device_prefetch
    mesh = create_mesh(('data', ), devices=jax.devices()[:2])
    batches = [_batch() for _ in range(5)]
    out = list(device_prefetch(iter(batches), mesh, size=2))
    assert len(out) == 5
    for got, want in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(got['image']),
                                      want['image'])


def test_frozen_mask_paths():
    det = build_detector(_cfg())
    variables = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    mask = frozen_mask(variables['params'], det.frozen_param_paths())
    flat = jax.tree_util.tree_leaves_with_path(mask)
    frozen = {('/'.join(str(getattr(p, 'key', p)) for p in kp))
              for kp, v in flat if not v}
    assert any('layer1_0' in f for f in frozen)
    assert any('conv1' in f for f in frozen)
    assert not any('layer2' in f for f in frozen)
    assert not any('head_net' in f for f in frozen)


def _vfnet_cfg():
    return dict(
        type='VFNet',
        backbone=dict(type='ResNet', depth=18, frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(type='VFNetHead', num_classes=4, in_channels=32,
                       stacked_convs=1, feat_channels=32),
        train_cfg=dict(assigner=dict(type='ATSSAssigner', topk=9)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type='nms', iou_threshold=0.6),
                      max_per_img=10))


def test_dp8_matches_dp1_new_head():
    """The zoo's new heads normalize by GLOBAL batch statistics (jnp sums
    over the sharded batch axis -> GSPMD collectives); VFNet's IoU-weighted
    avg factors are the trickiest — verify dp8 == dp1 end to end."""
    assert len(jax.devices()) >= 8

    def run(n_devices, n_steps=2):
        det = build_detector(_vfnet_cfg())
        mesh = create_mesh(('data', ),
                           devices=jax.devices()[:n_devices])
        schedule = build_lr_schedule(0.01, dict(warmup_iters=2,
                                                step=[100]), 2, 10)
        variables = det.init_variables(jax.random.PRNGKey(0),
                                       (1, 64, 96, 3))
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
        return losses

    np.testing.assert_allclose(run(1), run(8), rtol=3e-4, atol=3e-5)


def test_paramwise_cfg_optimizer():
    """mmcv DefaultOptimizerConstructor paramwise_cfg parity: bias_lr_mult /
    bias_decay_mult on non-norm biases, norm_decay_mult on norm params
    (scale AND bias); composes with frozen-path masking."""
    import numpy as np
    import optax
    from ld_tpu.parallel.optim import build_optimizer

    params = {
        'backbone': {'conv1': {'kernel': jnp.ones((3, 3, 4, 4)),
                               'bias': jnp.ones(4)},
                     'norm1': {'scale': jnp.ones(4), 'bias': jnp.ones(4)}},
        'head': {'fc': {'kernel': jnp.ones((4, 2)), 'bias': jnp.ones(2)}},
    }
    sched = lambda c: 0.1
    cfg = dict(type='SGD', lr=0.1, momentum=0.0, weight_decay=0.0,
               paramwise_cfg=dict(bias_lr_mult=2.0, bias_decay_mult=0.0))
    tx = build_optimizer(cfg, sched, params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    assert np.allclose(updates['head']['fc']['kernel'], -0.1)
    assert np.allclose(updates['head']['fc']['bias'], -0.2)
    assert np.allclose(updates['backbone']['norm1']['bias'], -0.1)

    cfg2 = dict(type='SGD', lr=0.1, momentum=0.0, weight_decay=0.5,
                paramwise_cfg=dict(bias_decay_mult=0.0, norm_decay_mult=0.0))
    tx2 = build_optimizer(cfg2, sched, params)
    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    u2, _ = tx2.update(zero, tx2.init(params), params)
    assert np.allclose(u2['head']['fc']['kernel'], -0.05)
    assert np.allclose(u2['head']['fc']['bias'], 0.0)
    assert np.allclose(u2['backbone']['norm1']['scale'], 0.0)

    tx3 = build_optimizer(cfg, sched, params,
                          frozen_prefixes=['backbone/conv1'])
    u3, _ = tx3.update(grads, tx3.init(params), params)
    assert np.allclose(u3['backbone']['conv1']['kernel'], 0.0)
    assert np.allclose(u3['head']['fc']['kernel'], -0.1)


def test_live_bn_stats_update_with_frozen_stage_eval():
    """norm_eval=False training (NAS-FPN recipe): BN running stats update
    through the jitted train step for unfrozen stages and the SepBN head,
    while the frozen stem/stage-1 BNs stay in eval mode (reference
    resnet.py _freeze_stages + retina_sepbn_head.py semantics)."""
    import copy
    import jax.tree_util as jtu
    from ld_tpu import Config

    cfg = Config.fromfile(
        'configs/nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py')
    mc = copy.deepcopy(dict(cfg.model))
    mc['backbone'].update(depth=18)
    mc['neck'].update(in_channels=[128, 256, 512], stack_times=1,
                      out_channels=64)
    mc['bbox_head'].update(in_channels=64, feat_channels=64, stacked_convs=1)
    det = build_detector(mc)
    mesh = create_mesh(('data', ), devices=jax.devices()[:1])
    sched = build_lr_schedule(0.01, dict(warmup_iters=2, step=[100]), 4, 12)
    v = det.init_variables(jax.random.PRNGKey(0), (1, 256, 256, 3))
    tx = build_optimizer(dict(type='SGD', lr=0.01, momentum=0.9,
                              weight_decay=1e-4), sched, v['params'],
                         frozen_prefixes=det.frozen_param_paths())
    state = create_train_state(det, jax.random.PRNGKey(0), tx,
                               (1, 256, 256, 3))
    before = jtu.tree_map(lambda x: np.asarray(x).copy(), state.batch_stats)
    step = jit_train_step(make_train_step(det, tx), mesh)
    gt = np.zeros((1, 4, 4), np.float32)
    gt[0, 0] = [16, 16, 128, 140]
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True
    batch = shard_batch(dict(
        image=jnp.asarray(np.random.RandomState(0).randn(1, 256, 256, 3),
                          jnp.float32),
        gt_bboxes=jnp.asarray(gt), gt_labels=jnp.zeros((1, 4), jnp.int32),
        gt_valid=jnp.asarray(valid), img_hw=jnp.asarray([[256., 256.]])),
        mesh)
    state2, _ = step(state, batch)
    after = jtu.tree_map(np.asarray, state2.batch_stats)
    assert np.allclose(after['backbone']['norm1']['bn']['mean'],
                       before['backbone']['norm1']['bn']['mean'])
    assert np.allclose(after['backbone']['layer1_0']['norm1']['bn']['mean'],
                       before['backbone']['layer1_0']['norm1']['bn']['mean'])
    assert not np.allclose(
        after['backbone']['layer2_0']['norm1']['bn']['mean'],
        before['backbone']['layer2_0']['norm1']['bn']['mean'])
    assert any(not np.allclose(a, b) for a, b in zip(
        jtu.tree_leaves(after['head_net']),
        jtu.tree_leaves(before['head_net'])))


def test_train_step_seed_threads_into_roi_sampling():
    """cfg.seed must drive the per-step RNG (reference threads its global
    seed through every sampler, mmdet/apis/train.py:18): different seeds
    change ROI sampling noise; the same seed reproduces it exactly."""
    import optax
    from tests.test_two_stage import cfg as ts_cfg, batch as ts_batch

    det = build_detector(dict(ts_cfg))
    mesh = create_mesh(('data', ), devices=jax.devices()[:1])
    opt = optax.sgd(0.01, momentum=0.9)

    def one_step(seed):
        state = create_train_state(det, jax.random.PRNGKey(0), opt,
                                   (1, 64, 96, 3))
        step = jit_train_step(make_train_step(det, opt, seed=seed), mesh)
        _, metrics = step(state, shard_batch(dict(ts_batch), mesh))
        return float(metrics['loss'])

    l0a, l0b, l1 = one_step(0), one_step(0), one_step(1)
    assert l0a == l0b
    assert l0a != l1, (l0a, l1)


def _run_steps_fsdp(n_devices, n_steps=3):
    det = build_detector(_cfg())
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
    step = jit_train_step(make_train_step(det, optimizer), mesh,
                          fsdp=True, state=state)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, shard_batch(_batch(), mesh))
        losses.append(float(metrics['loss']))
    return losses, state


def _run_steps_axes(axis_names, axis_sizes, n_steps=3, **step_kw):
    det = build_detector(_cfg())
    mesh = create_mesh(axis_names, axis_sizes, devices=jax.devices()[:8])
    schedule = build_lr_schedule(0.01, dict(warmup_iters=2, step=[100]),
                                 2, 10)
    variables = det.init_variables(jax.random.PRNGKey(0), (1, 64, 96, 3))
    optimizer = build_optimizer(
        dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=1e-4),
        schedule, variables['params'],
        frozen_prefixes=det.frozen_param_paths())
    state = create_train_state(det, jax.random.PRNGKey(0), optimizer,
                               (1, 64, 96, 3))
    step = jit_train_step(make_train_step(det, optimizer), mesh,
                          state=state, **step_kw)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, shard_batch(_batch(), mesh))
        losses.append(float(metrics['loss']))
    return losses, state


def test_sp_fsdp_matches_dp1():
    """Spatial partitioning (image H split across the 'sp' axis; GSPMD
    halo-exchange on every conv — the TPU-native way to scale one 800x1344
    image past per-chip memory/latency) composed with ZeRO-3 over 'data':
    both are sharding layouts, so numerics must track the 1-device run."""
    assert len(jax.devices()) >= 8
    l1, s1 = _run_steps(1)
    l8, s8 = _run_steps_axes(('data', 'sp'), (4, 2), sp=True, fsdp=True)
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=2e-5)
    p1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s1.params)]
    p8 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s8.params)]
    worst = max(float(np.abs(a - b).max()) for a, b in zip(p1, p8))
    assert worst < 1e-4, worst


def test_sp_grads_match_dp1():
    """Per-leaf GRADIENT exactness under sp (+fsdp) vs 1 device. A
    forward-only loss check cannot see this: round-2 shipped an sp path
    whose layer3/4 kernel grads were wrong by 8e-3 absolute (XLA SPMD
    partitioner miscomputes the backward of convs on small H-sharded
    maps) while the first-step loss matched to 1e-6. The stage-boundary
    gather (utils/act_sharding.sp_stage_scope) keeps deep stages in the
    dp layout, which must make every grad leaf match to fp tolerance."""
    assert len(jax.devices()) >= 8
    import optax
    from ld_tpu.parallel.train_step import create_train_state

    det = build_detector(_cfg())
    opt = optax.sgd(0.0)  # lr 0: params don't move, metrics carry the loss
    state = create_train_state(det, jax.random.PRNGKey(0), opt,
                               (1, 64, 96, 3))
    batch = _batch()

    def loss_fn(params, b):
        variables = {'params': params, 'batch_stats': state.batch_stats}
        losses = det.forward_train(variables, b)
        return sum(jnp.asarray(v) for k, v in losses.items() if 'loss' in k)

    g1 = jax.jit(jax.grad(loss_fn))(state.params, dict(batch))
    g1 = jax.tree_util.tree_map(np.asarray, g1)

    mesh = create_mesh(('data', 'sp'), (4, 2), devices=jax.devices()[:8])
    step = jit_train_step(make_train_step(det, opt), mesh, sp=True,
                          fsdp=True, state=state)
    # recover grads from the sgd(0) step: with lr 0 updates are zero, so
    # instead grab them via a dedicated jit mirroring the sp wrapper
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ld_tpu.parallel.mesh import param_sharding, data_sharding
    from ld_tpu.utils.act_sharding import (loss_sharding_scope,
                                           sp_stage_scope,
                                           sp_resident_param_patterns)
    sp_sh = NamedSharding(mesh, P('data', 'sp'))
    dp_sh = NamedSharding(mesh, P('data'))
    params_sh = param_sharding(
        mesh, state.params, fsdp_axis='data',
        exclude_substrings=sp_resident_param_patterns(1))

    def grad_sp(params, b):
        b = dict(b, image=jax.lax.with_sharding_constraint(
            b['image'], sp_sh))
        with sp_stage_scope(sp_sh, dp_sh, 1), loss_sharding_scope(dp_sh):
            return jax.grad(loss_fn)(params, b)

    g8 = jax.jit(grad_sp, in_shardings=(params_sh, data_sharding(mesh)),
                 out_shardings=params_sh)(
        jax.device_put(state.params, params_sh),
        shard_batch(_batch(), mesh))
    g8 = jax.tree_util.tree_map(np.asarray, g8)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat8 = jax.tree_util.tree_flatten_with_path(g8)[0]
    for (path, a), (_, b) in zip(flat1, flat8):
        scale = float(np.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            a, b, atol=2e-5 * max(scale, 1.0),
            err_msg=jax.tree_util.keystr(path))
    assert step is not None


def _cfg_out0():
    """Backbone exports stage 0 (out_indices=(0,..)) into an FPN lateral
    whose weights get fsdp-sharded — the cascade/HTC-shaped combination
    where the stage-0 map is sp-resident (< gather_stage). Regression for
    the reshard_export gather (utils/act_sharding.py): without it this is
    exactly the channel-sharded-weights + H-sharded-activations SPMD
    miscompile."""
    cfg = _cfg()
    cfg['neck'] = dict(type='FPN', in_channels=[64, 128, 256, 512],
                       out_channels=32, start_level=0,
                       add_extra_convs='on_output', num_outs=5)
    return cfg


def test_sp_fsdp_out_indices0_matches_dp1():
    assert len(jax.devices()) >= 8
    import optax
    det = build_detector(_cfg_out0())
    opt = optax.sgd(0.01, momentum=0.9)
    state = create_train_state(det, jax.random.PRNGKey(0), opt,
                               (1, 64, 96, 3))
    mesh1 = create_mesh(('data', ), devices=jax.devices()[:1])
    step1 = jit_train_step(make_train_step(det, opt), mesh1)
    s1, m1 = step1(state, shard_batch(_batch(), mesh1))

    state = create_train_state(det, jax.random.PRNGKey(0), opt,
                               (1, 64, 96, 3))
    mesh8 = create_mesh(('data', 'sp'), (4, 2), devices=jax.devices()[:8])
    step8 = jit_train_step(make_train_step(det, opt), mesh8, sp=True,
                           fsdp=True, state=state)
    s8, m8 = step8(state, shard_batch(_batch(), mesh8))
    np.testing.assert_allclose(float(m1['loss']), float(m8['loss']),
                               rtol=2e-4)
    p1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s1.params)]
    p8 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s8.params)]
    worst = max(float(np.abs(a - b).max()) for a, b in zip(p1, p8))
    assert worst < 1e-4, worst


@pytest.mark.xfail(
    strict=True,
    reason='CANARY for the XLA SPMD partitioner miscompile that '
           'exclude_substrings works around (parallel/mesh.py: sp-resident '
           'stage params stay replicated because channel-sharded weights + '
           'H-sharded activations miscompute). This test runs the sp+fsdp '
           'gradient WITHOUT the exclusion and asserts dp1 agreement: '
           'today that FAILS (expected — the bug is live). If a jax/XLA '
           'upgrade fixes the partitioner this XPASSes as a strict error, '
           'signalling the workaround (and its replication memory cost) '
           'can be removed.')
def test_sp_fsdp_without_workaround_canary():
    assert len(jax.devices()) >= 8
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ld_tpu.parallel.mesh import param_sharding, data_sharding
    from ld_tpu.utils.act_sharding import (loss_sharding_scope,
                                           sp_stage_scope)

    det = build_detector(_cfg())
    opt = optax.sgd(0.0)
    state = create_train_state(det, jax.random.PRNGKey(0), opt,
                               (1, 64, 96, 3))
    batch = _batch()

    def loss_fn(params, b):
        variables = {'params': params, 'batch_stats': state.batch_stats}
        losses = det.forward_train(variables, b)
        return sum(jnp.asarray(v) for k, v in losses.items() if 'loss' in k)

    g1 = jax.jit(jax.grad(loss_fn))(state.params, dict(batch))
    g1 = jax.tree_util.tree_map(np.asarray, g1)

    mesh = create_mesh(('data', 'sp'), (4, 2), devices=jax.devices()[:8])
    sp_sh = NamedSharding(mesh, P('data', 'sp'))
    dp_sh = NamedSharding(mesh, P('data'))
    # NO exclude_substrings: sp-resident stage params get fsdp-sharded too
    params_sh = param_sharding(mesh, state.params, fsdp_axis='data')

    def grad_sp(params, b):
        b = dict(b, image=jax.lax.with_sharding_constraint(
            b['image'], sp_sh))
        with sp_stage_scope(sp_sh, dp_sh, 1), loss_sharding_scope(dp_sh):
            return jax.grad(loss_fn)(params, b)

    g8 = jax.jit(grad_sp, in_shardings=(params_sh, data_sharding(mesh)),
                 out_shardings=params_sh)(
        jax.device_put(state.params, params_sh),
        shard_batch(_batch(), mesh))
    g8 = jax.tree_util.tree_map(np.asarray, g8)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat8 = jax.tree_util.tree_flatten_with_path(g8)[0]
    for (path, a), (_, b) in zip(flat1, flat8):
        scale = float(np.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            a, b, atol=2e-5 * max(scale, 1.0),
            err_msg=jax.tree_util.keystr(path))


def test_tp_fsdp_matches_dp1():
    """Tensor parallelism (every weight's last divisible dim — C_out —
    split across the 'model' axis, Megatron-style weight-stationary layout)
    composed with ZeRO-3 over 'data': numerics must track dp1 and the
    kernels must actually live split along C_out."""
    assert len(jax.devices()) >= 8
    l1, s1 = _run_steps(1)
    l8, s8 = _run_steps_axes(('data', 'model'), (4, 2), tp=True, fsdp=True)
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=2e-5)
    p1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s1.params)]
    p8 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s8.params)]
    worst = max(float(np.abs(a - b).max()) for a, b in zip(p1, p8))
    assert worst < 1e-4, worst
    tp_split = 0
    for x in jax.tree_util.tree_leaves(s8.params):
        if hasattr(x, 'addressable_shards') and getattr(x, 'ndim', 0) == 4:
            shard = x.addressable_shards[0].data
            if shard.shape[-1] < x.shape[-1]:
                tp_split += 1
    assert tp_split > 0


def test_sp_tp_composition_guard():
    """sp x tp composition is guarded off: the current XLA SPMD partitioner
    miscompiles a conv whose activations are spatially sharded AND whose
    weights are C_out-sharded. Minimal repro (kept here as the canary —
    if XLA fixes it this starts failing and the guard can be lifted):

        mesh = Mesh(devices.reshape(2,2,2), ('data','sp','model'))
        x: (8,32,48,8) constrained P('data','sp'); w: (3,3,8,16) placed
        P(None,None,None,'model') -> conv output garbage (diff == scale),
        while w on P(None,None,'model',None) (C_in) is exact to 1e-6.
    """
    import pytest
    det = build_detector(_cfg())
    mesh = create_mesh(('data', 'sp', 'model'), (2, 2, 2),
                       devices=jax.devices()[:8])
    state = create_train_state(det, jax.random.PRNGKey(0),
                               __import__('optax').sgd(0.01), (1, 64, 96, 3))
    with pytest.raises(NotImplementedError, match='miscompiles'):
        jit_train_step(make_train_step(det, __import__('optax').sgd(0.01)),
                       mesh, sp=True, tp=True, state=state)


def test_param_sharding_specs():
    """tp takes the last divisible dim, fsdp the largest remaining one;
    both on one leaf without conflict; indivisible leaves replicate."""
    from jax.sharding import PartitionSpec as P
    from ld_tpu.parallel import create_mesh, param_sharding
    mesh = create_mesh(('data', 'sp', 'model'), (2, 2, 2),
                       devices=jax.devices()[:8])
    tree = {
        'conv': jnp.zeros((3, 3, 16, 32)),   # fsdp->dim2(16<32? no: dim3
        # taken by tp, largest remaining is 16 at dim 2)
        'bias': jnp.zeros((32, )),           # tp takes dim0; fsdp: none left
        'tiny': jnp.zeros((3, )),            # indivisible -> replicated
    }
    sh = param_sharding(mesh, tree, fsdp_axis='data', tp_axis='model')
    assert sh['conv'].spec == P(None, None, 'data', 'model')
    assert sh['bias'].spec == P('model')
    assert sh['tiny'].spec == P()
    sh_f = param_sharding(mesh, tree, fsdp_axis='data')
    assert sh_f['conv'].spec == P(None, None, None, 'data')
    assert sh_f['tiny'].spec == P()


def test_fsdp8_matches_dp1():
    """ZeRO-3 sharding (params + optimizer state split over the data axis)
    is a memory layout, not a numerics change: the fsdp step must track the
    replicated 1-device run and actually shard the big parameter leaves."""
    assert len(jax.devices()) >= 8
    l1, s1 = _run_steps(1)
    l8, s8 = _run_steps_fsdp(8)
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=2e-5)
    p1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s1.params)]
    p8 = [np.asarray(x) for x in jax.tree_util.tree_leaves(s8.params)]
    worst = max(float(np.abs(a - b).max()) for a, b in zip(p1, p8))
    assert worst < 1e-4, worst
    # memory claim holds: at least one large leaf is genuinely sharded
    # (addressable shard smaller than the global array)
    sharded = 0
    for x in jax.tree_util.tree_leaves(s8.params):
        if hasattr(x, 'addressable_shards') and x.size >= 8:
            shard = x.addressable_shards[0].data
            if shard.size < x.size:
                sharded += 1
    assert sharded > 0
