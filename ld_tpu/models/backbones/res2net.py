"""Res2Net backbone (hierarchical multi-scale residual splits).

Parity: /root/reference/mmdet/models/backbones/res2net.py:17 (Bottle2neck) —
conv1 expands to width*scales channels, the splits run through a chain of
3x3 convs where split i adds the previous branch output ('normal' blocks)
or takes its split directly ('stage' blocks, i.e. the first block of a
stage); the last split is passed through (avg-pooled when the stage block
strides). mmdet's Res2Net uses the v1d-style deep stem + avg-down shortcut
(res2net.py:246-248: `super(..., deep_stem=True, avg_down=True)`).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import BACKBONES
from .resnet import BatchNorm, _conv, _shortcut

ARCH_SETTINGS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class Bottle2neck(nn.Module):
    planes: int                 # output = planes * 4
    stride: int = 1
    downsample: bool = False
    scales: int = 4
    base_width: int = 26
    stage_block: bool = False   # first block of a stage
    norm_eval: bool = True
    with_dcn: bool = False      # DCNv2 on every split 3x3 (mmdet Res2Net dcn)
    dcn_deform_groups: int = 1
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * self.base_width / 64.0)
        identity = x
        out = nn.Conv(width * self.scales, (1, 1), use_bias=False,
                      name='conv1', dtype=self.dtype)(x)
        out = BatchNorm(use_running_average=self.norm_eval, name='norm1',
                        dtype=self.dtype)(out, train)
        out = nn.relu(out)

        splits = jnp.split(out, self.scales, axis=-1)
        outs = []
        sp = None
        for i in range(self.scales - 1):
            sp_in = splits[i] if (self.stage_block or i == 0) \
                else sp + splits[i]
            if self.with_dcn:
                from ld_tpu.ops.deform_conv import ModulatedDeformConv
                sp = ModulatedDeformConv(
                    width, kernel_size=3, stride=self.stride,
                    deform_groups=self.dcn_deform_groups,
                    dtype=self.dtype, name=f'convs{i}')(sp_in)
            else:
                sp = nn.Conv(width, (3, 3),
                             strides=(self.stride, self.stride),
                             padding=[(1, 1)] * 2, use_bias=False,
                             name=f'convs{i}', dtype=self.dtype)(sp_in)
            sp = BatchNorm(use_running_average=self.norm_eval,
                           name=f'bns{i}', dtype=self.dtype)(sp, train)
            sp = nn.relu(sp)
            outs.append(sp)
        last = splits[-1]
        if self.stage_block and self.stride != 1:
            last = nn.avg_pool(last, (3, 3),
                               strides=(self.stride, self.stride),
                               padding=[(1, 1)] * 2)
        outs.append(last)
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name='conv3', dtype=self.dtype)(out)
        out = BatchNorm(use_running_average=self.norm_eval, name='norm3',
                        dtype=self.dtype)(out, train)
        if self.downsample:
            identity = _shortcut(x, self.planes * self.expansion,
                                 self.stride, True, self.norm_eval,
                                 self.dtype, train)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class Res2Net(nn.Module):
    depth: int = 50
    scales: int = 4
    base_width: int = 26
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: dict = None
    style: str = 'pytorch'
    dcn: dict = None
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_blocks = ARCH_SETTINGS[self.depth][:self.num_stages]
        # v1d deep stem
        for i, (s, ch) in enumerate(((2, 32), (1, 32), (1, 64))):
            x = _conv(ch, 3, s, f'stem_conv{i+1}', self.dtype)(x)
            x = BatchNorm(use_running_average=self.norm_eval,
                          name=f'stem_norm{i+1}', dtype=self.dtype)(x, train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        in_planes = 64
        for stage, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2**stage
            stride = self.strides[stage]
            for b in range(num_blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or in_planes != planes * 4)
                x = Bottle2neck(
                    planes=planes, stride=s, downsample=need_ds,
                    scales=self.scales, base_width=self.base_width,
                    stage_block=(b == 0), norm_eval=self.norm_eval,
                    with_dcn=(self.dcn is not None and
                              self.stage_with_dcn[stage]),
                    dcn_deform_groups=(self.dcn or {}).get(
                        'deform_groups', 1),
                    dtype=self.dtype, name=f'layer{stage+1}_{b}')(x, train)
            in_planes = planes * 4
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)

    def frozen_param_paths(self):
        paths = []
        if self.frozen_stages >= 0:
            paths += ['stem_conv1', 'stem_norm1', 'stem_conv2', 'stem_norm2',
                      'stem_conv3', 'stem_norm3']
        for stage in range(1, self.frozen_stages + 1):
            paths.append(f'layer{stage}_')
        return paths
