"""Training API: the full wiring from config to compiled SPMD train loop.

Parity: /root/reference/mmdet/apis/train.py:37 (train_detector: dataloaders
-> DDP wrap -> optimizer -> EpochBasedRunner + hooks) re-designed TPU-first:
one process, one pjit'd step over a 'data' mesh; LR schedule, grad clipping,
frozen-stage masking are part of the optax chain; checkpointing via orbax;
eval hook runs the jitted test path + host-side COCO/VOC evaluation.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.data import build_dataloader, build_dataset
from ld_tpu.models import build_detector
from ld_tpu.parallel import (build_lr_schedule, build_optimizer, create_mesh,
                             device_prefetch,
                             create_train_state, jit_train_step,
                             make_train_step, shard_batch)
from ld_tpu.utils.checkpoint import (load_checkpoint, load_variables,
                                     load_torch_checkpoint, merge_variables,
                                     save_checkpoint, save_variables,
                                     validate_variables)
from ld_tpu.utils.logging import get_root_logger


def set_random_seed(seed: int, deterministic: bool = True):
    """Parity shim for /root/reference/mmdet/apis/train.py:18 — jax PRNG is
    already deterministic; numpy drives host-side augmentation."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def _load_teacher_variables(detector, cfg, logger, rng, input_shape):
    ckpt = getattr(detector, 'teacher_ckpt', None)
    if ckpt and os.path.exists(str(ckpt)):
        logger.info(f'loading teacher checkpoint {ckpt}')
        if str(ckpt).endswith('.pth'):
            # strict: raises on unconvertible torch keys (a partially-
            # mapped teacher silently trains against garbage targets)
            variables = load_torch_checkpoint(str(ckpt))
            variables.pop('_unmapped', None)
        else:
            variables = load_variables(str(ckpt))
        # shape-verify against the model's teacher tree before training
        template = jax.eval_shape(
            lambda: detector.init_teacher_variables(rng, input_shape))
        return validate_variables(variables, template,
                                  what=f'teacher checkpoint {ckpt}')
    logger.warning('teacher checkpoint missing — random-init teacher '
                   f'({ckpt}); distillation targets are untrained!')
    return detector.init_teacher_variables(rng, input_shape)


def train_detector(cfg, work_dir: str, dataset=None, max_steps=None,
                   eval_interval_epochs: Optional[int] = None,
                   log_interval: Optional[int] = None) -> Dict:
    """Run the training described by `cfg`; returns final metrics."""
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(work_dir, 'train.log'))
    rng = set_random_seed(cfg.get('seed', 0))
    if cfg.get('debug'):
        # NaN guard (the TPU answer to SURVEY §5.2's sanitizer gap): any NaN
        # produced inside the jitted step raises at the exact primitive
        jax.config.update('jax_debug_nans', True)
        logger.info('debug mode: jax_debug_nans enabled')

    dataset = dataset or build_dataset(cfg.data['train'])
    # cfg.sp / cfg.tp: sizes of the spatial-partitioning and tensor-parallel
    # mesh axes (default 1 = pure DP). With sp/tp the data-parallel world
    # shrinks to n_devices/(sp*tp); each image is split across sp chips
    # (H-axis halo convs) and each weight across tp chips (C_out).
    sp_size = int(cfg.get('sp') or 1)
    tp_size = int(cfg.get('tp') or 1)
    if sp_size > 1 or tp_size > 1:
        mesh = create_mesh(('data', 'sp', 'model'), (-1, sp_size, tp_size))
    else:
        mesh = create_mesh(('data', ))
    n_dev = mesh.shape['data']
    samples_per_dev = cfg.data.get('samples_per_gpu', 2)
    pad_hw = cfg.get('pad_to', (800, 1344))
    # pad_to may be a list of static shape buckets (multi-scale training):
    # each batch pads to its smallest fitting bucket; the step compiles once
    # per bucket. Init/eval use the largest bucket.
    buckets = list(map(tuple, pad_hw)) \
        if isinstance(pad_hw[0], (tuple, list)) else [tuple(pad_hw)]
    pad_hw = buckets if len(buckets) > 1 else buckets[0]
    max_pad_hw = max(buckets, key=lambda s: s[0] * s[1])
    max_gts = cfg.get('max_gts_per_image', 100)
    loader = build_dataloader(dataset, samples_per_dev, n_dev, pad_hw,
                              max_gts, seed=cfg.get('seed', 0),
                              batch_scales=cfg.get('batch_scales'),
                              scale_sampling=cfg.get('scale_sampling',
                                                     'image_range'),
                              group_pad_buckets=cfg.get('group_pad_buckets',
                                                        True))
    steps_per_epoch = len(loader)
    runner_cfg = cfg.get('runner', {})
    if runner_cfg.get('type') == 'IterBasedRunner':
        # iteration-budget training (reference IterBasedRunner, e.g.
        # configs/faster_rcnn/..._90k_coco.py): run whole epochs until the
        # iteration budget is hit; lr_config steps are already in iters
        max_iters = runner_cfg.get('max_iters', 90000)
        max_epochs = -(-max_iters // max(steps_per_epoch, 1))
        max_steps = max_steps or max_iters
        lr_steps_per_epoch = 1
    else:
        max_epochs = runner_cfg.get('max_epochs', 12)
        lr_steps_per_epoch = steps_per_epoch

    # top-level `dtype` (configs/fp16 family): lower supporting towers to
    # bf16 compute; params/losses/optimizer stay fp32 (models/__init__.py)
    detector = build_detector(cfg.model, dtype=cfg.get('dtype'))
    has_teacher = hasattr(detector, 'teacher')
    # reference NumClassCheckHook: dataset class count must match the head
    ds_classes = getattr(dataset, 'CLASSES', None)
    head = getattr(detector, 'bbox_head', None)
    if ds_classes and head is not None and \
            getattr(head, 'num_classes', None) not in (None,
                                                       len(ds_classes)):
        logger.warning(
            f'dataset has {len(ds_classes)} classes but '
            f'bbox_head.num_classes={head.num_classes} — check the config')

    init_shape = (1, ) + max_pad_hw + (3, )
    schedule = build_lr_schedule(cfg.optimizer['lr'], cfg.get('lr_config', {}),
                                 lr_steps_per_epoch, max_epochs)
    variables = detector.init_variables(rng, init_shape)
    optimizer = build_optimizer(
        cfg.optimizer, schedule, variables['params'],
        frozen_prefixes=detector.frozen_param_paths(),
        grad_clip=cfg.get('optimizer_config', {}).get('grad_clip'))
    state = create_train_state(detector, rng, optimizer, init_shape)
    del variables

    teacher_vars = None
    if has_teacher:
        teacher_vars = _load_teacher_variables(detector, cfg, logger,
                                               jax.random.PRNGKey(1),
                                               init_shape)
        if cfg.get('fold_teacher_bn', True):
            # the teacher runs inference-only with frozen BN statistics
            # (reference: no_grad + eval teacher, kd_one_stage.py:69-80),
            # so folding its BN scale into the conv kernels is
            # value-identical (utils/fuse_conv_bn.py); gated off for
            # ConvWS teachers where the fold would be silently wrong
            from ld_tpu.utils.fuse_conv_bn import (fuse_conv_bn,
                                                   fuse_conv_bn_cfg_ok)
            tcfg = getattr(detector, 'teacher_model_cfg', None)
            if tcfg is None or fuse_conv_bn_cfg_ok(tcfg):
                teacher_vars = fuse_conv_bn(teacher_vars)
                logger.info('teacher conv+BN folded into kernels '
                            '(disable with fold_teacher_bn=False)')

    if cfg.get('load_from'):
        # reference runner.load_checkpoint semantics: weights only (params +
        # batch_stats), optimizer state and step start fresh — fine-tuning
        src = str(cfg['load_from'])
        logger.info(f'loading weights from {src}')
        if src.endswith('.pth'):
            # lenient by design (reference load_checkpoint logs missing/
            # unexpected for student fine-tune init); teachers stay strict
            loaded = load_torch_checkpoint(src, strict=False)
            unmapped = loaded.pop('_unmapped', [])
            if unmapped:
                logger.warning(
                    f'load_from: {len(unmapped)} torch keys did not map '
                    f'(first few: {unmapped[:5]}) — the matching ld_tpu '
                    'params keep their fresh init; convert explicitly with '
                    'tools/model_converters/mmdet2ldtpu.py to audit')
        else:
            loaded = load_variables(src)
        # overlay onto the fresh init: leaves absent from the checkpoint
        # (or shape-mismatched, e.g. a different num_classes head) keep
        # their init — mmcv load_checkpoint strict=False fine-tune behavior
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        batch_stats = jax.tree_util.tree_map(lambda x: x, state.batch_stats)
        n_ok, skipped = merge_variables(params, loaded['params'])
        bs_ok, bs_skip = merge_variables(batch_stats,
                                         loaded.get('batch_stats', {}))
        if skipped or bs_skip:
            logger.warning(
                f'load_from: {len(skipped) + len(bs_skip)} checkpoint '
                f'leaves skipped (missing/shape-mismatched in the model; '
                f'first few: {(skipped + bs_skip)[:5]})')
        logger.info(f'load_from: {len(n_ok)} param leaves loaded')
        state = state._replace(params=params, batch_stats=batch_stats)
    if cfg.get('resume_from'):
        state = load_checkpoint(cfg['resume_from'], state)
        logger.info(f'resumed from step {int(state.step)}')

    # cfg.fsdp: ZeRO-3 params+optimizer sharding over the data axis
    # (1/n_devices state memory per chip; all-gather-at-use inserted by
    # XLA). No reference analogue — DDP replicates everything.
    step_fn = jit_train_step(make_train_step(detector, optimizer,
                                             has_teacher=has_teacher,
                                             remat=bool(cfg.get('remat')),
                                             seed=int(cfg.get('seed') or 0)),
                             mesh, has_teacher=has_teacher,
                             fsdp=bool(cfg.get('fsdp')), state=state,
                             sp=sp_size > 1, tp=tp_size > 1,
                             teacher_variables=teacher_vars)

    log_interval = log_interval or cfg.get('log_config', {}).get(
        'interval', 50)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f'start training: {n_params/1e6:.1f}M params, '
                f'{mesh.devices.size} devices '
                f'(mesh {dict(mesh.shape)}), {steps_per_epoch} '
                f'steps/epoch, {max_epochs} epochs')

    json_log = open(os.path.join(work_dir, 'log.json'), 'a')
    global_step = int(state.step)
    best_score = float('-inf')  # EvalHook save_best tracking

    # TensorboardLoggerHook parity (default_runtime log_config.hooks):
    # activated by listing it, exactly like the reference
    tb_writer = None
    if any(h.get('type') == 'TensorboardLoggerHook'
           for h in cfg.get('log_config', {}).get('hooks', [])):
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb_writer = SummaryWriter(os.path.join(work_dir, 'tf_logs'))
        except ImportError:
            logger.warning('TensorboardLoggerHook requested but no '
                           'tensorboard available')

    # Preemption-safe training (the TPU answer to SURVEY §5.3's recovery
    # gap — TPU VMs are preemptible): SIGTERM triggers a checkpoint at the
    # next step boundary, so `resume_from` continues exactly where the
    # preemption hit instead of at the last epoch end.
    import signal
    preempted = {'flag': False}

    def _on_sigterm(signum, frame):
        preempted['flag'] = True
        logger.warning('SIGTERM received — checkpointing at next step')

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # non-main thread
        prev_handler = None
    metrics = {}
    t_last = time.perf_counter()
    start_epoch = global_step // max(steps_per_epoch, 1)
    ckpt_cfg = cfg.get('checkpoint_config', {}) or {}
    last_saved_step = -1
    stop = False
    diverged = False
    for epoch in range(start_epoch, max_epochs):
        loader.set_epoch(epoch)
        batch_iter = iter(loader)
        if epoch == start_epoch and global_step > epoch * steps_per_epoch:
            # mid-epoch resume (preemption checkpoint): the epoch's shuffle
            # is deterministic in (seed, epoch), so skipping the
            # already-trained prefix continues with exactly the batches the
            # interrupted run never saw
            skip = global_step - epoch * steps_per_epoch
            logger.info(f'mid-epoch resume: skipping first {skip} batches '
                        f'of epoch {epoch + 1}')
            import itertools
            batch_iter = itertools.islice(batch_iter, skip, None)
        for batch in device_prefetch(batch_iter, mesh):
            state, metrics = step_fn(state, batch, teacher_vars) \
                if has_teacher else step_fn(state, batch)
            global_step += 1
            if global_step % log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                # divergence guard: jax_debug_nans does not reliably fire
                # through pjit, so check the host-side metrics explicitly
                # (mmcv has no equivalent; NaN there poisons silently)
                if not all(np.isfinite(v) for v in metrics.values()):
                    logger.error(
                        f'NON-FINITE loss at step {global_step}: {metrics} '
                        '— stopping. Lower the lr / enable grad_clip '
                        '(optimizer_config.grad_clip) or warmup_iters.')
                    json_log.write(json.dumps(
                        dict(mode='train', iter=global_step,
                             error='non-finite loss')) + '\n')
                    # forensic dump under a separate name: the orbax
                    # checkpoint chain must keep the last GOOD weights as
                    # its latest step (resume_from must not pick NaN state)
                    save_variables(
                        os.path.join(work_dir, 'diverged_state.npz'),
                        {'params': state.params,
                         'batch_stats': state.batch_stats})
                    diverged = True
                    stop = True
                    break
                dt = (time.perf_counter() - t_last) / log_interval
                t_last = time.perf_counter()
                lr = float(schedule(global_step))
                line = dict(mode='train', epoch=epoch + 1, iter=global_step,
                            lr=round(lr, 6), time=round(dt, 4),
                            **{k: round(v, 5) for k, v in metrics.items()})
                logger.info(' '.join(f'{k}={v}' for k, v in line.items()))
                json_log.write(json.dumps(line) + '\n')
                json_log.flush()
                if tb_writer is not None:
                    for k, v in metrics.items():
                        tb_writer.add_scalar(f'train/{k}', v, global_step)
                    tb_writer.add_scalar('train/lr', lr, global_step)
            if preempted['flag']:
                save_checkpoint(work_dir, state,
                                keep=ckpt_cfg.get('max_keep_ckpts', 3))
                last_saved_step = global_step
                logger.warning(
                    f'preemption checkpoint at step {global_step} — resume '
                    f"with resume_from='{work_dir}'")
                stop = True
                break
            if max_steps and global_step >= max_steps:
                stop = True
                break
        # checkpoint hook (parity: mmcv CheckpointHook — checkpoint_config
        # interval in epochs, max_keep_ckpts)
        ckpt_every = ckpt_cfg.get('interval', 1)
        if not stop and ckpt_every and (epoch + 1) % ckpt_every == 0:
            save_checkpoint(work_dir, state,
                            keep=ckpt_cfg.get('max_keep_ckpts', 3))
            last_saved_step = global_step
        # eval hook (parity: mmdet EvalHook, eval_hooks.py:14)
        eval_every = eval_interval_epochs or cfg.get('evaluation', {}).get(
            'interval', 0)
        if not stop and eval_every and (epoch + 1) % eval_every == 0 and \
                'val' in cfg.get('data', {}):
            try:
                from ld_tpu.apis.test import eval_detector
                val_ds = build_dataset(cfg.data['val'])
                variables = {'params': state.params,
                             'batch_stats': state.batch_stats}
                results = eval_detector(detector, variables, val_ds,
                                        pad_hw=pad_hw, mesh=mesh)
                val_metrics = val_ds.evaluate(
                    results, metric=cfg.get('evaluation', {}).get('metric',
                                                                  'bbox'))
                line = dict(mode='val', epoch=epoch + 1, iter=global_step,
                            **{k: round(float(v), 5)
                               for k, v in val_metrics.items()
                               if isinstance(v, (int, float))})
                logger.info(' '.join(f'{k}={v}' for k, v in line.items()))
                json_log.write(json.dumps(line) + '\n')
                json_log.flush()
                # best-checkpoint tracking (parity: EvalHook save_best,
                # eval_hooks.py `best_*` — reference tracks e.g. bbox_mAP
                # and keeps the best epoch's weights)
                best_key = cfg.get('evaluation', {}).get('save_best')
                if best_key and best_key in val_metrics:
                    cur = float(val_metrics[best_key])
                    if cur > best_score:
                        best_score = cur
                        save_variables(
                            os.path.join(work_dir, f'best_{best_key}.npz'),
                            variables)
                        logger.info(
                            f'new best {best_key}={cur:.5f} '
                            f'(epoch {epoch + 1}) -> best_{best_key}.npz')
            except FileNotFoundError as e:
                logger.warning(f'eval skipped: {e}')
        if stop:
            break
    if last_saved_step != global_step and not diverged:
        # final-weights guarantee: a max_steps exit or a non-multiple
        # checkpoint interval must still leave the latest state on disk
        # (skipped after divergence — NaN weights must never become the
        # latest resumable checkpoint)
        save_checkpoint(work_dir, state,
                        keep=ckpt_cfg.get('max_keep_ckpts', 3))
    json_log.close()
    if tb_writer is not None:
        tb_writer.close()
    if prev_handler is not None:
        signal.signal(signal.SIGTERM, prev_handler)
    return dict(state=state, metrics={k: float(v) for k, v in
                                      metrics.items()} if metrics else {},
                detector=detector, mesh=mesh, teacher_vars=teacher_vars,
                preempted=preempted['flag'])
