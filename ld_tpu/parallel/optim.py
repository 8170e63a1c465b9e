"""Optimizer + LR schedule construction.

Parity targets: mmcv SGD hook stack used by every reference config —
SGD(momentum=0.9, weight_decay=1e-4), step LR with 500-iter linear warmup
(/root/reference/configs/_base_/schedules/schedule_1x.py), optional global
grad clipping (optimizer_config.grad_clip), and `requires_grad=False` frozen
backbone stages (resnet.py `_freeze_stages`) — expressed as an optax chain
with a path-mask so frozen parameters receive neither updates nor decay.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, 'key', getattr(p, 'idx', p))))
    return '/'.join(parts)


def frozen_mask(params, frozen_prefixes: Sequence[str]):
    """Pytree of bools: True = trainable, False = frozen.

    A pattern freezes a leaf when the leaf's '/'-joined path starts with
    it, contains '/<pattern>', or (for patterns containing a '*')
    fnmatch-matches it — e.g. 'backbone/*/bn/*' freezes every backbone BN
    affine param (norm_cfg requires_grad=False semantics)."""
    from fnmatch import fnmatch

    def hit(s, p):
        if '*' in p:
            return fnmatch(s, p)
        return s.startswith(p) or ('/' + p) in s

    def trainable(path, _):
        s = _path_str(path)
        return not any(hit(s, p) for p in frozen_prefixes)

    return jax.tree_util.tree_map_with_path(trainable, params)


def build_lr_schedule(base_lr: float, lr_config: Dict,
                      steps_per_epoch: int,
                      max_epochs: int) -> Callable[[int], jnp.ndarray]:
    """mmcv StepLrUpdater semantics: linear warmup from warmup_ratio*lr over
    warmup_iters, then x0.1 (gamma) at each epoch in `step`."""
    policy = lr_config.get('policy', 'step')
    warmup_iters = lr_config.get('warmup_iters', 500)
    warmup_ratio = lr_config.get('warmup_ratio', 0.001)
    gamma = lr_config.get('gamma', 0.1)
    steps = lr_config.get('step', [8, 11])
    boundaries = jnp.asarray([s * steps_per_epoch for s in steps])

    def schedule(count):
        count = jnp.asarray(count)
        if policy == 'step':
            regular = base_lr * gamma**jnp.sum(count >= boundaries)
        elif policy == 'cosine':
            total = max_epochs * steps_per_epoch
            regular = base_lr * 0.5 * (1 + jnp.cos(
                jnp.pi * jnp.minimum(count, total) / total))
        else:
            raise ValueError(policy)
        frac = jnp.clip(count / max(warmup_iters, 1), 0.0, 1.0)
        warm_factor = warmup_ratio + (1.0 - warmup_ratio) * frac
        return regular * warm_factor

    return schedule


_NORM_MODULE_HINTS = ('norm', 'bn', 'gn')


def _paramwise_label(path, paramwise: Dict) -> str:
    """mmcv DefaultOptimizerConstructor paramwise_cfg semantics
    (bias_lr_mult / bias_decay_mult / norm_decay_mult): norm-module params
    (scale AND bias) get norm_decay_mult; other `bias` leaves get
    bias_lr_mult + bias_decay_mult. Returns 'lr<mult>_wd<mult>'."""
    parts = [str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path]
    lr_mult, decay_mult = 1.0, 1.0
    is_norm = any(h in part.lower() for part in parts[:-1]
                  for h in _NORM_MODULE_HINTS)
    if is_norm:
        decay_mult = paramwise.get('norm_decay_mult', 1.0)
    elif parts[-1] == 'bias':
        lr_mult = paramwise.get('bias_lr_mult', 1.0)
        decay_mult = paramwise.get('bias_decay_mult', 1.0)
    return f'lr{lr_mult}_wd{decay_mult}'


def build_optimizer(optimizer_cfg: Dict,
                    lr_schedule,
                    params,
                    frozen_prefixes: Sequence[str] = (),
                    grad_clip: Dict = None) -> optax.GradientTransformation:
    """SGD+momentum+decoupled-into-grad weight decay (torch SGD semantics:
    wd is added to the gradient BEFORE momentum), masked over frozen paths.
    Supports mmcv paramwise_cfg (bias_lr_mult, bias_decay_mult,
    norm_decay_mult) via per-group transforms."""
    opt_type = optimizer_cfg.get('type', 'SGD')
    wd = optimizer_cfg.get('weight_decay', 0.0)
    paramwise = optimizer_cfg.get('paramwise_cfg') or {}

    def group_chain(lr_mult: float, decay_mult: float):
        chain = []
        if opt_type == 'SGD':
            if wd * decay_mult:
                chain.append(optax.add_decayed_weights(wd * decay_mult))
            momentum = optimizer_cfg.get('momentum', 0.9)
            if momentum:
                # torch SGD: v = mu*v + g ; p -= lr*v (no dampening/Nesterov)
                chain.append(optax.trace(decay=momentum, nesterov=False))
        elif opt_type == 'AdamW':
            chain.append(optax.scale_by_adam(
                b1=optimizer_cfg.get('betas', (0.9, 0.999))[0],
                b2=optimizer_cfg.get('betas', (0.9, 0.999))[1]))
            if wd * decay_mult:
                chain.append(optax.add_decayed_weights(wd * decay_mult))
        else:
            raise ValueError(f'unsupported optimizer {opt_type}')
        if lr_mult == 1.0:
            chain.append(optax.scale_by_learning_rate(lr_schedule))
        else:
            chain.append(optax.scale_by_learning_rate(
                lambda count: lr_schedule(count) * lr_mult))
        return optax.chain(*chain)

    trainable = frozen_mask(params, frozen_prefixes) if frozen_prefixes \
        else jax.tree_util.tree_map(lambda _: True, params)

    def label(path, _):
        if not _label_trainable(trainable, path):
            return 'freeze'
        if not paramwise:
            return 'lr1.0_wd1.0'
        return _paramwise_label(path, paramwise)

    labels = jax.tree_util.tree_map_with_path(label, params)
    groups = {l for l in jax.tree_util.tree_leaves(labels)}
    transforms = {'freeze': optax.set_to_zero()}
    for g in groups:
        if g == 'freeze':
            continue
        lr_mult = float(g.split('_')[0][2:])
        decay_mult = float(g.split('_')[1][2:])
        transforms[g] = group_chain(lr_mult, decay_mult)
    # global grad clip must see the whole gradient BEFORE per-group updates
    tx = optax.multi_transform(transforms, labels)
    if grad_clip:
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip.get('max_norm', 35.0)), tx)
    return tx


def _label_trainable(trainable_tree, path) -> bool:
    node = trainable_tree
    for p in path:
        key = getattr(p, 'key', getattr(p, 'idx', None))
        node = node[key]
    return bool(node)
