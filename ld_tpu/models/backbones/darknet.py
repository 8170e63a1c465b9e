"""Darknet-53 backbone (flax, NHWC).

Parity: /root/reference/mmdet/models/backbones/darknet.py — conv-BN-LeakyReLU
blocks, 5 stages of (stride-2 downsample + n residual units),
n = (1, 2, 8, 8, 4), outputs of stages 3/4/5 (channels 256/512/1024).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ld_tpu.utils.registry import BACKBONES
from .resnet import BatchNorm


class ConvBNLeaky(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p)] * 2, use_bias=False, dtype=self.dtype,
                    name='conv')(x)
        x = BatchNorm(use_running_average=self.norm_eval, name='bn',
                      dtype=self.dtype)(x, train)
        return nn.leaky_relu(x, 0.1)


class DarkResBlock(nn.Module):
    channels: int
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNLeaky(self.channels // 2, 1, norm_eval=self.norm_eval,
                          dtype=self.dtype, name='conv1')(x, train)
        out = ConvBNLeaky(self.channels, 3, norm_eval=self.norm_eval,
                          dtype=self.dtype, name='conv2')(out, train)
        return x + out


@BACKBONES.register_module()
class Darknet(nn.Module):
    depth: int = 53
    out_indices: Tuple[int, ...] = (3, 4, 5)
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.depth == 53
        x = ConvBNLeaky(32, 3, norm_eval=self.norm_eval, dtype=self.dtype,
                        name='stem')(x, train)
        outs = []
        blocks = (1, 2, 8, 8, 4)
        channels = (64, 128, 256, 512, 1024)
        for stage, (n, c) in enumerate(zip(blocks, channels), start=1):
            x = ConvBNLeaky(c, 3, stride=2, norm_eval=self.norm_eval,
                            dtype=self.dtype,
                            name=f'down{stage}')(x, train)
            for b in range(n):
                x = DarkResBlock(c, norm_eval=self.norm_eval,
                                 dtype=self.dtype,
                                 name=f'stage{stage}_{b}')(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)

    def frozen_param_paths(self):
        paths = []
        if self.frozen_stages >= 0:
            paths.append('stem')
        for s in range(1, self.frozen_stages + 1):
            paths += [f'down{s}', f'stage{s}_']
        return paths
