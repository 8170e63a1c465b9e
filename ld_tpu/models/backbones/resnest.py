"""ResNeSt backbone (split-attention networks), NHWC/TPU-native.

Parity: /root/reference/mmdet/models/backbones/resnest.py —
SplitAttentionConv2d (radix-grouped 3x3 + per-radix softmax channel
attention, `RSoftmax`), the ResNeSt bottleneck (attention conv2, optional
3x3 avg-pool stride `avg_down_stride`), on a ResNetV1d trunk (deep stem
with configurable `stem_channels`, avg-pool downsample shortcuts).

Channel layout: the grouped conv's output decomposes radix-major —
channel c = r*width + g*K + k (K = width/groups); the attention logits
from fc2 decompose group-major, c = g*(R*K) + r*K + k. The radix softmax
therefore reshapes (B, G, R, K) -> softmax over R -> transpose to
(B, R, G*K), matching the torch view/transpose/reshape chain exactly.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ld_tpu.utils.registry import BACKBONES
from .resnet import BatchNorm, _conv

ARCH = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
    200: (3, 24, 36, 3),
}


class SplitAttentionConv(nn.Module):
    channels: int            # per-radix width
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w, r, g = self.channels, self.radix, self.groups
        inter = max(x.shape[-1] * r // self.reduction_factor, 32)
        d = self.dilation
        out = nn.Conv(w * r, (3, 3), strides=(self.stride, self.stride),
                      padding=[(d, d)] * 2, kernel_dilation=(d, d),
                      feature_group_count=g * r, use_bias=False,
                      name='conv', dtype=self.dtype)(x)
        out = BatchNorm(use_running_average=self.norm_eval, name='norm0',
                        dtype=self.dtype)(out, train)
        out = nn.relu(out)
        b, hh, ww, _ = out.shape
        splits = out.reshape(b, hh, ww, r, w)           # radix-major chunks
        gap = splits.sum(3).mean((1, 2), keepdims=True)  # (B,1,1,w)
        gap = nn.Conv(inter, (1, 1), feature_group_count=g, use_bias=True,
                      name='fc1', dtype=self.dtype)(gap)
        gap = BatchNorm(use_running_average=self.norm_eval, name='norm1',
                        dtype=self.dtype)(gap, train)
        gap = nn.relu(gap)
        atten = nn.Conv(w * r, (1, 1), feature_group_count=g, use_bias=True,
                        name='fc2', dtype=self.dtype)(gap)  # (B,1,1,w*r)
        if r > 1:
            k = w // g
            a = atten.reshape(b, g, r, k)
            a = jax.nn.softmax(a, axis=2)
            a = jnp.transpose(a, (0, 2, 1, 3)).reshape(b, r, w)
            out = (splits * a[:, None, None, :, :]).sum(3)
        else:
            out = splits[..., 0, :] * jax.nn.sigmoid(
                atten.reshape(b, 1, 1, w))
        return out


class ResNeStBottleneck(nn.Module):
    filters: int             # planes; output is 4x
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    reduction_factor: int = 4
    avg_down_stride: bool = True
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.filters if self.groups == 1 else \
            int(self.filters * (self.base_width / 64.0)) * self.groups
        avd = self.avg_down_stride and self.stride > 1
        out = nn.Conv(width, (1, 1), use_bias=False, name='conv1',
                      dtype=self.dtype)(x)
        out = BatchNorm(use_running_average=self.norm_eval, name='norm1',
                        dtype=self.dtype)(out, train)
        out = nn.relu(out)
        out = SplitAttentionConv(width,
                                 stride=1 if avd else self.stride,
                                 dilation=self.dilation, groups=self.groups,
                                 radix=self.radix,
                                 reduction_factor=self.reduction_factor,
                                 norm_eval=self.norm_eval, dtype=self.dtype,
                                 name='conv2')(out, train)
        if avd:
            out = nn.avg_pool(out, (3, 3), strides=(self.stride, ) * 2,
                              padding=[(1, 1)] * 2)
        out = nn.Conv(self.filters * self.expansion, (1, 1), use_bias=False,
                      name='conv3', dtype=self.dtype)(out)
        out = BatchNorm(use_running_average=self.norm_eval, name='norm3',
                        dtype=self.dtype)(out, train)
        identity = x
        if self.downsample:
            # ResNetV1d avg_down shortcut: stride via 2x2 avg pool, then 1x1
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, ) * 2,
                                       strides=(self.stride, ) * 2)
            identity = nn.Conv(self.filters * self.expansion, (1, 1),
                               use_bias=False, name='downsample_conv',
                               dtype=self.dtype)(identity)
            identity = BatchNorm(use_running_average=self.norm_eval,
                                 name='downsample_norm',
                                 dtype=self.dtype)(identity, train)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNeSt(nn.Module):
    depth: int = 50
    stem_channels: int = 64
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: dict = None    # accepted for config parity
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    reduction_factor: int = 4
    avg_down_stride: bool = True
    style: str = 'pytorch'   # accepted for config parity (V1d trunk)
    deep_stem: bool = True
    avg_down: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_blocks = ARCH[self.depth][:self.num_stages]
        # V1d deep stem: 3x(3x3), channels stem/2, stem/2, stem
        half = self.stem_channels // 2
        for i, (c, s) in enumerate(((half, 2), (half, 1),
                                    (self.stem_channels, 1))):
            x = _conv(c, 3, s, f'stem_conv{i+1}', self.dtype)(x)
            x = BatchNorm(use_running_average=self.norm_eval or self.frozen_stages >= 0,
                          name=f'stem_norm{i+1}', dtype=self.dtype)(x, train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        in_planes = self.stem_channels
        for stage, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2**stage
            stride = self.strides[stage]
            for blk in range(num_blocks):
                s = stride if blk == 0 else 1
                need_ds = blk == 0 and (s != 1 or in_planes != planes * 4)
                x = ResNeStBottleneck(
                    planes, stride=s, downsample=need_ds,
                    norm_eval=self.norm_eval or
                    stage + 1 <= self.frozen_stages,
                    dilation=self.dilations[stage], groups=self.groups,
                    base_width=self.base_width, radix=self.radix,
                    reduction_factor=self.reduction_factor,
                    avg_down_stride=self.avg_down_stride,
                    dtype=self.dtype,
                    name=f'layer{stage+1}_{blk}')(x, train)
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
