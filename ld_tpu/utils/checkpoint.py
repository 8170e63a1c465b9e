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


def _dcn_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> the (k*k*cin, O) flattened layout of
    ld_tpu.ops.deform_conv.ModulatedDeformConv (row = tap*cin + cin_idx,
    exactly HWIO reshaped row-major)."""
    hwio = _conv_kernel(w)
    return hwio.reshape(-1, hwio.shape[-1])


def _dcn_offset_perm(out_ch: int, k: int) -> np.ndarray:
    """Output-channel permutation mmcv ModulatedDeformConv2dPack ->
    ld_tpu ModulatedDeformConv for the zero-init `conv_offset` conv.

    mmcv (/root/reference's mmcv-full 1.2.7 dep) chunks the 3*g*k*k
    channels into (o1, o2, mask) thirds, then offset = cat(o1, o2) is read
    by the CUDA kernel per deform group as interleaved (y_tap, x_tap)
    pairs; ld_tpu reshapes its conv_offset output to (..., g, 3, k*k) with
    component-major (all-y, all-x, all-mask) blocks per group. perm[new]
    = old channel index."""
    g = out_ch // (3 * k * k)
    assert g * 3 * k * k == out_ch, (out_ch, k)
    perm = np.empty(out_ch, np.int64)
    kk = k * k
    for gi in range(g):
        for t in range(kk):
            perm[gi * 3 * kk + t] = gi * 2 * kk + 2 * t            # y
            perm[gi * 3 * kk + kk + t] = gi * 2 * kk + 2 * t + 1   # x
            perm[gi * 3 * kk + 2 * kk + t] = 2 * g * kk + gi * kk + t
    return perm


def _dcn_offset_leaf(leaf: str):
    """Conversion fn for a `*.conv_offset.(weight|bias)` tensor.

    The weight infers k from its own (…, k, k) shape. The BIAS is 1-D —
    out_ch = 3*g*k*k is ambiguous on its own (g=1,k=3 and g=9,k=1 both
    give 27) — so its permutation is applied in convert_torch_state_dict's
    loop, which reads k from the sibling `conv_offset.weight`; here it is
    identity."""
    if leaf == 'weight':
        def fn(w):
            k = w.shape[-1]
            return _conv_kernel(w[_dcn_offset_perm(w.shape[0], k)])
        return fn
    return lambda b: b


# mmdet SSDVGG `features` module indices (VGG-16, ceil_mode pools, fc6/fc7
# appended) -> ld_tpu ssd_vgg conv names
_VGG16_FEATURES = {
    0: 'conv1_0', 2: 'conv1_1', 5: 'conv2_0', 7: 'conv2_1',
    10: 'conv3_0', 12: 'conv3_1', 14: 'conv3_2',
    17: 'conv4_0', 19: 'conv4_1', 21: 'conv4_2',
    24: 'conv5_0', 26: 'conv5_1', 28: 'conv5_2',
    31: 'fc6', 33: 'fc7',
}


def _map_backbone(key: str, has_offset):
    """mmdet 'backbone.*' / torchvision resnet / ssd-vgg names ->
    (collection, path). `has_offset(base)` reports whether the conv at
    torch prefix `base` carries a DCN `conv_offset` sibling."""
    m = re.match(r'(?:backbone\.)?conv1\.weight$', key)
    if m:
        return 'params', ('conv1', 'kernel'), _conv_kernel
    m = re.match(r'(?:backbone\.)?bn1\.(\w+)$', key)
    if m:
        return _bn_leaf('norm1', m.group(1))
    # ResNetV1d deep stem: stem.{0,3,6} convs + stem.{1,4,7} BNs
    m = re.match(r'(?:backbone\.)?stem\.(\d)\.(\w+)$', key)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        if i % 3 == 0 and leaf == 'weight':
            return 'params', (f'stem_conv{i // 3 + 1}',
                              'kernel'), _conv_kernel
        if i % 3 == 1:
            return _bn_leaf(f'stem_norm{i // 3 + 1}', leaf)
    m = re.match(r'(?:backbone\.)?layer(\d)\.(\d+)\.(conv\d)'
                 r'(\.conv_offset)?\.(weight|bias)$', key)
    if m:
        s, b, conv, off, leaf = m.groups()
        if off:
            return 'params', (f'layer{s}_{b}', conv, 'conv_offset',
                              'kernel' if leaf == 'weight' else 'bias'), \
                _dcn_offset_leaf(leaf)
        if leaf == 'weight':
            is_dcn = has_offset(f'layer{s}.{b}.{conv}')
            return 'params', (f'layer{s}_{b}', conv, 'kernel'), \
                (_dcn_kernel if is_dcn else _conv_kernel)
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
    # SSD-VGG (mmdet SSDVGG: VGG-16 `features` + `extra` + `l2_norm`)
    m = re.match(r'(?:backbone\.)?features\.(\d+)\.(weight|bias)$', key)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        name = _VGG16_FEATURES.get(i)
        if name is not None:
            fn = _conv_kernel if leaf == 'weight' else (lambda x: x)
            return 'params', (name,
                              'kernel' if leaf == 'weight' else 'bias'), fn
    m = re.match(r'(?:backbone\.)?extra\.(\d+)\.(weight|bias)$', key)
    if m:
        j, leaf = int(m.group(1)), m.group(2)
        fn = _conv_kernel if leaf == 'weight' else (lambda x: x)
        return 'params', (f'extra{j // 2}_{j % 2 + 1}',
                          'kernel' if leaf == 'weight' else 'bias'), fn
    if re.match(r'(?:backbone\.)?l2_norm\.weight$', key):
        return 'params', ('l2_norm', 'gamma'), (lambda x: x)
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


# final-prediction conv names across the GFL family. mmdet's RetinaGFLHead
# REUSES the `atss_cls`/`atss_reg` attribute names (/root/reference/mmdet/
# models/dense_heads/retina_gfl_head.py:258-263) while ld_tpu's
# RetinaGFLHeadNet calls them retina_cls/retina_reg — disambiguated by the
# absence of `atss_centerness` (every mmdet ATSS-GFL head has one,
# atss_gfl_head.py:122; retina has none).
_FINAL_CONVS = {
    'gfl_cls': 'gfl_cls', 'gfl_reg': 'gfl_reg',
    'atss_cls': 'atss_cls', 'atss_reg': 'atss_reg',
    'atss_centerness': 'atss_centerness',
    # FCOS-GFL torch names (fcos_gfl_head.py:159-164); ld_tpu's
    # FCOSGFLHeadNet inherits the ATSS net's module names
    'conv_cls': 'atss_cls', 'conv_reg': 'atss_reg',
    'conv_centerness': 'atss_centerness',
}


def _map_head(key: str, has_offset, retina_style: bool):
    m = re.match(r'bbox_head\.(cls|reg)_convs\.(\d+)\.conv'
                 r'(\.conv_offset)?\.(weight|bias)$', key)
    if m:
        kind, i, off, leaf = m.groups()
        if retina_style and not off:
            # RetinaGFLHeadNet towers are bare biased convs (no GN):
            # flax path cls_conv{i}/kernel, no Conv_0 subscope
            fn = _conv_kernel if leaf == 'weight' else (lambda x: x)
            return 'params', (f'{kind}_conv{i}',
                              'kernel' if leaf == 'weight' else 'bias'), fn
        is_dcn = has_offset(f'{kind}_convs.{i}.conv')
        sub = 'ModulatedDeformConv_0' if is_dcn else 'Conv_0'
        if off:
            return 'params', (f'{kind}_conv{i}', sub, 'conv_offset',
                              'kernel' if leaf == 'weight' else 'bias'), \
                _dcn_offset_leaf(leaf)
        if leaf == 'weight':
            return 'params', (f'{kind}_conv{i}', sub, 'kernel'), \
                (_dcn_kernel if is_dcn else _conv_kernel)
    m = re.match(r'bbox_head\.(cls|reg)_convs\.(\d+)\.gn\.(weight|bias)$',
                 key)
    if m:
        kind, i, leaf = m.groups()
        return 'params', (f'{kind}_conv{i}', 'GroupNorm_0',
                          'scale' if leaf == 'weight' else 'bias'), \
            (lambda x: x)
    m = re.match(r'bbox_head\.(\w+)\.(weight|bias)$', key)
    if m and m.group(1) in _FINAL_CONVS:
        name, leaf = _FINAL_CONVS[m.group(1)], m.group(2)
        if retina_style and name.startswith('atss_'):
            name = name.replace('atss_', 'retina_')
        fn = _conv_kernel if leaf == 'weight' else (lambda x: x)
        return 'params', (name, 'kernel' if leaf == 'weight' else 'bias'), fn
    # GFocalV2 DGQP branch: reg_conf = Sequential(Conv1x1, ReLU, Conv1x1,
    # Sigmoid) (/root/reference/mmdet/models/dense_heads/gfocal_head.py:
    # 145-149) -> ld_tpu reg_conf_1/reg_conf_2
    m = re.match(r'bbox_head\.reg_conf\.([02])\.(weight|bias)$', key)
    if m:
        i, leaf = m.groups()
        fn = _conv_kernel if leaf == 'weight' else (lambda x: x)
        return 'params', (f'reg_conf_{1 if i == "0" else 2}',
                          'kernel' if leaf == 'weight' else 'bias'), fn
    m = re.match(r'bbox_head\.scales\.(\d+)\.scale$', key)
    if m:
        return 'scales', int(m.group(1)), (lambda x: x)
    return None


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray],
                             num_laterals: int = 3,
                             num_levels: int = 5) -> Dict:
    """Convert an mmdet GFL-family (or bare torchvision ResNet / SSD-VGG)
    state_dict into an ld_tpu variables tree
    {'params': ..., 'batch_stats': ...}.

    Covers every published LD/GFL teacher family (/root/reference/README.md
    model zoo): ResNet/ResNeXt/V1d backbones incl. DCN stages (conv2 +
    conv_offset of the R101-DCN teachers), FPN, GFL/GFocalV2 (DGQP
    reg_conf) / ATSS-GFL / FCOS-GFL / Retina-GFL heads incl.
    dcn_on_last_conv towers.

    Unrecognized keys are collected under the returned tree's
    '_unmapped' list so callers can assert completeness.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    scales = np.ones((num_levels, ), np.float32)
    unmapped = []
    keys = set(state_dict)

    def bb_has_offset(base: str) -> bool:
        return (f'backbone.{base}.conv_offset.weight' in keys or
                f'{base}.conv_offset.weight' in keys)

    def head_has_offset(base: str) -> bool:
        return f'bbox_head.{base}.conv_offset.weight' in keys

    # mmdet RetinaGFLHead reuses atss_* names but has no centerness conv
    retina_style = (any(k.startswith('bbox_head.atss_cls.') for k in keys)
                    and not any(k.startswith('bbox_head.atss_centerness.')
                                for k in keys))

    def insert(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, value in state_dict.items():
        value = np.asarray(value)
        if key.endswith('conv_offset.bias'):
            # permute here, where the sibling weight's (…, k, k) shape
            # disambiguates k (see _dcn_offset_leaf docstring)
            w = state_dict.get(key[:-len('bias')] + 'weight')
            k = int(np.asarray(w).shape[-1]) if w is not None else 3
            value = value[_dcn_offset_perm(value.shape[0], k)]
        is_backbone = key.startswith('backbone.') or not key.startswith(
            ('neck.', 'bbox_head.'))
        hit = None
        if is_backbone:
            hit = _map_backbone(key, bb_has_offset)
            scope = 'backbone'
        if hit is None and key.startswith('neck.'):
            hit = _map_neck(key, num_laterals)
            scope = 'neck'
        if hit is None and key.startswith('bbox_head.'):
            hit = _map_head(key, head_has_offset, retina_style)
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

    if any(k.startswith('bbox_head.scales.') for k in state_dict):
        params.setdefault('head_net', {})['scales'] = jnp.asarray(scales)
    out = {'params': params, 'batch_stats': batch_stats}
    out['_unmapped'] = unmapped
    return out


def _leaf_shapes(tree, skip=('_unmapped', )) -> Dict[str, tuple]:
    out = {}
    for kp, v in jax.tree_util.tree_leaves_with_path(tree):
        path = jax.tree_util.keystr(kp)
        if any(s in path for s in skip):
            continue
        out[path] = tuple(getattr(v, 'shape', ()))
    return out


def validate_variables(variables: Dict, template: Dict,
                       what: str = 'checkpoint') -> Dict:
    """Hard-verify a converted variables tree against a model's init tree
    (e.g. from `jax.eval_shape`): every template leaf must be present with
    the exact shape, and no extra leaves may exist. Raises ValueError with
    the full lists otherwise — a silently partial teacher is how an LD run
    trains against garbage distillation targets
    (/root/reference/mmdet/models/detectors/kd_one_stage.py:42-44 loads
    teachers strictly through mmcv load_checkpoint)."""
    got = _leaf_shapes(variables)
    want = _leaf_shapes(template)
    problems = []
    for path, shape in want.items():
        if path not in got:
            problems.append(f'missing {path} {shape}')
        elif got[path] != shape:
            problems.append(f'shape mismatch {path}: checkpoint '
                            f'{got[path]} vs model {shape}')
    for path in got:
        if path not in want:
            problems.append(f'unexpected {path} {got[path]}')
    if problems:
        raise ValueError(
            f'{what} does not match the model ({len(problems)} problems):\n'
            + '\n'.join('  ' + p for p in problems[:50]))
    return variables


def merge_variables(dst: Dict, src: Dict, _path: str = ''):
    """Overlay `src` leaves onto a (fresh-init) `dst` tree, in place.

    Returns (loaded_paths, skipped) where `skipped` lists src paths whose
    leaf is missing in dst or shape-mismatched (those keep dst's value) —
    mmcv load_checkpoint's lenient strict=False semantics for student
    fine-tune init (`load_from`)."""
    loaded, skipped = [], []
    for key, val in src.items():
        path = f'{_path}/{key}'
        if isinstance(val, dict):
            if not isinstance(dst.get(key), dict):
                skipped.append(f'{path}/...')
                continue
            sub_l, sub_s = merge_variables(dst[key], val, path)
            loaded.extend(sub_l)
            skipped.extend(sub_s)
        else:
            cur = dst.get(key)
            if cur is None or getattr(cur, 'shape', None) != \
                    getattr(val, 'shape', None):
                skipped.append(path)
                continue
            dst[key] = jnp.asarray(val, getattr(cur, 'dtype', None))
            loaded.append(path)
    return loaded, skipped


def load_torch_checkpoint(path: str, strict: bool = True, **kwargs) -> Dict:
    """Load a .pth file (CPU) and convert. Accepts mmdet checkpoints
    ({'state_dict': ...}) and raw state dicts.

    strict=True (default) raises on any torch key the converter could not
    map — matching mmcv load_checkpoint's contract for teachers. The
    returned tree still carries '_unmapped' (empty under strict) for
    callers that report instead of raise (tools/model_converters)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in sd.items()}
    out = convert_torch_state_dict(sd, **kwargs)
    if strict and out['_unmapped']:
        raise ValueError(
            f'{len(out["_unmapped"])} torch keys could not be converted '
            f'from {path} (pass strict=False to tolerate):\n' +
            '\n'.join('  ' + k for k in out['_unmapped'][:50]))
    return out
