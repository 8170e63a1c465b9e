"""Stacked Hourglass backbone (CornerNet / Centripetal).

Parity: /root/reference/mmdet/models/backbones/hourglass.py:81 —
recursive hourglass modules over BasicBlocks (up1 + nearest-upsampled low3),
7x7/2 + stride-2 ResLayer stem, inter-stack remap (1x1 convs summed, relu,
inter ResLayer), one 3x3 out conv per stack; returns per-stack feature maps.
The low3 ResLayer changes channels in its LAST block
(`downsample_first=False`). The reference trains CornerNet from scratch
with live BN; here BN defaults to frozen running statistics (affine still
trainable) like every other backbone in this framework — pass
norm_eval=False AND thread a mutable 'batch_stats' collection to train
with live BN.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ld_tpu.utils.registry import BACKBONES
from .resnet import BasicBlock, BatchNorm


def _upsample2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.kernel // 2, self.kernel // 2)] * 2,
                    use_bias=True, name='conv', dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=self.norm_eval, name='bn',
                      dtype=self.dtype)(x, train)
        return nn.relu(x) if self.act else x


class ResLayer(nn.Module):
    """n BasicBlocks; channel/stride change in the first (or last) block."""
    out_channels: int
    num_blocks: int
    stride: int = 1
    downsample_first: bool = True
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for b in range(self.num_blocks):
            change = b == (0 if self.downsample_first
                           else self.num_blocks - 1)
            stride = self.stride if change else 1
            out_ch = self.out_channels if change or not self.downsample_first \
                else self.out_channels
            need_ds = change and (stride != 1 or x.shape[-1] != out_ch)
            ch = self.out_channels if (change or self.downsample_first) \
                else x.shape[-1]
            x = BasicBlock(ch, stride=stride, downsample=need_ds,
                           norm_eval=self.norm_eval, dtype=self.dtype,
                           name=f'block{b}')(x, train)
        return x


class HourglassModule(nn.Module):
    depth: int
    stage_channels: Tuple[int, ...]
    stage_blocks: Tuple[int, ...]
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_ch, next_ch = self.stage_channels[0], self.stage_channels[1]
        cur_blk, next_blk = self.stage_blocks[0], self.stage_blocks[1]
        up1 = ResLayer(cur_ch, cur_blk, norm_eval=self.norm_eval,
                       dtype=self.dtype, name='up1')(x, train)
        low1 = ResLayer(next_ch, cur_blk, stride=2,
                        norm_eval=self.norm_eval, dtype=self.dtype,
                        name='low1')(x, train)
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:],
                                   norm_eval=self.norm_eval,
                                   dtype=self.dtype, name='low2')(low1, train)
        else:
            low2 = ResLayer(next_ch, next_blk, norm_eval=self.norm_eval,
                            dtype=self.dtype, name='low2')(low1, train)
        low3 = ResLayer(cur_ch, cur_blk, downsample_first=False,
                        norm_eval=self.norm_eval, dtype=self.dtype,
                        name='low3')(low2, train)
        return up1 + _upsample2(low3)


@BACKBONES.register_module()
class HourglassNet(nn.Module):
    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    norm_eval: bool = True
    norm_cfg: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_ch = self.stage_channels[0]
        x = ConvBN(128, 7, 2, norm_eval=self.norm_eval, dtype=self.dtype,
                   name='stem_conv')(x, train)
        inter = ResLayer(cur_ch, 1, stride=2, norm_eval=self.norm_eval,
                         dtype=self.dtype, name='stem_res')(x, train)
        outs = []
        for ind in range(self.num_stacks):
            hg = HourglassModule(
                self.downsample_times, self.stage_channels,
                self.stage_blocks, norm_eval=self.norm_eval,
                dtype=self.dtype, name=f'hourglass{ind}')(inter, train)
            out = ConvBN(self.feat_channel, 3, norm_eval=self.norm_eval,
                         dtype=self.dtype, name=f'out_conv{ind}')(hg, train)
            outs.append(out)
            if ind < self.num_stacks - 1:
                a = ConvBN(cur_ch, 1, act=False, norm_eval=self.norm_eval,
                           dtype=self.dtype, name=f'conv1x1_{ind}')(
                               inter, train)
                b = ConvBN(cur_ch, 1, act=False, norm_eval=self.norm_eval,
                           dtype=self.dtype, name=f'remap{ind}')(out, train)
                inter = ResLayer(cur_ch, 1, norm_eval=self.norm_eval,
                                 dtype=self.dtype,
                                 name=f'inter{ind}')(nn.relu(a + b), train)
        return tuple(outs)

    def frozen_param_paths(self):
        return []
