"""Checkpointing: orbax-backed save/resume + torch-checkpoint conversion.

Parity targets:
  * mmcv CheckpointHook / runner.resume
    (/root/reference/mmdet/apis/train.py:166-169, SURVEY.md §5.4): we persist
    {params, batch_stats, opt_state, step} with orbax, so resume restores the
    optimizer and schedule position exactly.
  * `load_checkpoint(map_location='cpu')` for teachers and torchvision
    pretrained backbones (/root/reference/mmdet/models/detectors/
    kd_one_stage.py:42-44): `convert_torch_state_dict` maps
    mmdet/torchvision parameter naming onto the ld_tpu flax tree (OIHW ->
    HWIO kernels, BN running stats -> batch_stats collection).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# orbax save / load
# --------------------------------------------------------------------------

def save_checkpoint(work_dir: str, state, step: Optional[int] = None,
                    keep: int = 3):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(work_dir, 'checkpoints'))
    os.makedirs(path, exist_ok=True)
    mngr = ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep))
    step = int(state.step) if step is None else step
    mngr.save(step, args=ocp.args.StandardSave(state._asdict()))
    mngr.wait_until_finished()
    return os.path.join(path, str(step))


def load_checkpoint(work_dir: str, state, step: Optional[int] = None):
    """Restore a TrainState saved by save_checkpoint (template = `state`)."""
    import orbax.checkpoint as ocp
    from ld_tpu.parallel.train_step import TrainState
    path = os.path.abspath(os.path.join(work_dir, 'checkpoints'))
    mngr = ocp.CheckpointManager(path)
    step = mngr.latest_step() if step is None else step
    restored = mngr.restore(
        step, args=ocp.args.StandardRestore(state._asdict()))
    return TrainState(**restored)


def save_variables(path: str, variables: Dict):
    """Flat .npz export of a variables tree (teacher publishing)."""
    flat = {}
    for kp, v in jax.tree_util.tree_leaves_with_path(variables):
        key = '/'.join(str(getattr(p, 'key', p)) for p in kp)
        flat[key] = np.asarray(v)
    np.savez(path, **flat)


def load_variables(path: str) -> Dict:
    data = np.load(path, allow_pickle=False)
    tree: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree


# --------------------------------------------------------------------------
# torch (mmdet / torchvision) -> ld_tpu flax conversion
# --------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _map_backbone(key: str):
    """mmdet 'backbone.*' / torchvision resnet names -> (collection, path)."""
    m = re.match(r'(?:backbone\.)?conv1\.weight$', key)
    if m:
        return 'params', ('conv1', 'kernel'), _conv_kernel
    m = re.match(r'(?:backbone\.)?bn1\.(\w+)$', key)
    if m:
        return _bn_leaf('norm1', m.group(1))
    m = re.match(r'(?:backbone\.)?layer(\d)\.(\d+)\.(conv\d)\.weight$', key)
    if m:
        s, b, conv = m.groups()
        return 'params', (f'layer{s}_{b}', conv, 'kernel'), _conv_kernel
    m = re.match(r'(?:backbone\.)?layer(\d)\.(\d+)\.bn(\d)\.(\w+)$', key)
    if m:
        s, b, i, leaf = m.groups()
        return _bn_leaf(f'layer{s}_{b}/norm{i}', leaf)
    m = re.match(r'(?:backbone\.)?layer(\d)\.(\d+)\.downsample\.0\.weight$',
                 key)
    if m:
        s, b = m.groups()
        return 'params', (f'layer{s}_{b}', 'downsample_conv',
                          'kernel'), _conv_kernel
    m = re.match(r'(?:backbone\.)?layer(\d)\.(\d+)\.downsample\.1\.(\w+)$',
                 key)
    if m:
        s, b, leaf = m.groups()
        return _bn_leaf(f'layer{s}_{b}/downsample_norm', leaf)
    return None


def _bn_leaf(prefix: str, torch_leaf: str):
    table = {
        'weight': ('params', 'scale'),
        'bias': ('params', 'bias'),
        'running_mean': ('batch_stats', 'mean'),
        'running_var': ('batch_stats', 'var'),
    }
    if torch_leaf not in table:  # num_batches_tracked
        return 'skip', None, None
    coll, leaf = table[torch_leaf]
    return coll, tuple(prefix.split('/')) + ('bn', leaf), lambda x: x


def _map_neck(key: str, num_laterals: int):
    m = re.match(r'neck\.lateral_convs\.(\d+)\.conv\.(weight|bias)$', key)
    if m:
        i, leaf = m.groups()
        fn = _conv_kernel if leaf == 'weight' else (lambda x: x)
        return 'params', (f'lateral_{i}',
                          'kernel' if leaf == 'weight' else 'bias'), fn
    m = re.match(r'neck\.fpn_convs\.(\d+)\.conv\.(weight|bias)$', key)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        name = f'fpn_conv_{i}' if i < num_laterals else \
            f'fpn_extra_{i - num_laterals}'
        fn = _conv_kernel if leaf == 'weight' else (lambda x: x)
        return 'params', (name, 'kernel' if leaf == 'weight' else 'bias'), fn
    return None


def _map_head(key: str):
    m = re.match(r'bbox_head\.(cls|reg)_convs\.(\d+)\.conv\.weight$', key)
    if m:
        kind, i = m.groups()
        return 'params', (f'{kind}_conv{i}', 'Conv_0',
                          'kernel'), _conv_kernel
    m = re.match(r'bbox_head\.(cls|reg)_convs\.(\d+)\.gn\.(weight|bias)$',
                 key)
    if m:
        kind, i, leaf = m.groups()
        return 'params', (f'{kind}_conv{i}', 'GroupNorm_0',
                          'scale' if leaf == 'weight' else 'bias'), \
            (lambda x: x)
    m = re.match(r'bbox_head\.(gfl_cls|gfl_reg)\.(weight|bias)$', key)
    if m:
        name, leaf = m.groups()
        fn = _conv_kernel if leaf == 'weight' else (lambda x: x)
        return 'params', (name, 'kernel' if leaf == 'weight' else 'bias'), fn
    m = re.match(r'bbox_head\.scales\.(\d+)\.scale$', key)
    if m:
        return 'scales', int(m.group(1)), (lambda x: x)
    return None


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray],
                             num_laterals: int = 3,
                             num_levels: int = 5) -> Dict:
    """Convert an mmdet GFL-family (or bare torchvision ResNet) state_dict
    into an ld_tpu variables tree {'params': ..., 'batch_stats': ...}.

    Unrecognized keys are collected under the returned tree's
    '_unmapped' list so callers can assert completeness.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    scales = np.ones((num_levels, ), np.float32)
    unmapped = []

    def insert(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, value in state_dict.items():
        value = np.asarray(value)
        is_backbone = key.startswith('backbone.') or not key.startswith(
            ('neck.', 'bbox_head.'))
        hit = None
        if is_backbone:
            hit = _map_backbone(key)
            scope = 'backbone'
        if hit is None and key.startswith('neck.'):
            hit = _map_neck(key, num_laterals)
            scope = 'neck'
        if hit is None and key.startswith('bbox_head.'):
            hit = _map_head(key)
            scope = 'head_net'
        if hit is None:
            if not key.endswith('num_batches_tracked'):
                unmapped.append(key)
            continue
        coll, path, fn = hit
        if coll == 'skip':
            continue
        if coll == 'scales':
            scales[path] = float(value)
            continue
        full = (scope, ) + path
        if coll == 'params':
            insert(params, full, fn(value))
        else:
            insert(batch_stats, full, fn(value))

    if any(k.startswith('bbox_head.') for k in state_dict):
        params.setdefault('head_net', {})['scales'] = jnp.asarray(scales)
    out = {'params': params, 'batch_stats': batch_stats}
    out['_unmapped'] = unmapped
    return out


def load_torch_checkpoint(path: str, **kwargs) -> Dict:
    """Load a .pth file (CPU) and convert. Accepts mmdet checkpoints
    ({'state_dict': ...}) and raw state dicts."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in sd.items()}
    return convert_torch_state_dict(sd, **kwargs)
