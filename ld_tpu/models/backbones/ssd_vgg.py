"""SSD-VGG16 backbone (flax, NHWC).

Parity: /root/reference/mmdet/models/backbones/ssd_vgg.py (VGG16 through
conv5_3, dilated fc6/fc7 convs, L2Norm on the conv4_3 output, extra
stride-2 feature layers for 6 detection scales).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ld_tpu.utils.registry import BACKBONES

VGG16_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'C', 512, 512, 512,
             'M', 512, 512, 512]


class L2Norm(nn.Module):
    scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param('gamma',
                           nn.initializers.constant(self.scale),
                           (x.shape[-1], ))
        norm = jnp.sqrt((x * x).sum(-1, keepdims=True) + 1e-10)
        return gamma * x / norm


@BACKBONES.register_module()
class SSDVGG(nn.Module):
    input_size: int = 300
    l2_norm_scale: float = 20.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype

        def convs(x, chans, prefix):
            for i, c in enumerate(chans):
                x = nn.relu(nn.Conv(c, (3, 3), padding=[(1, 1)] * 2,
                                    dtype=d, name=f'{prefix}_{i}')(x))
            return x

        x = convs(x, [64, 64], 'conv1')
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = convs(x, [128, 128], 'conv2')
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = convs(x, [256, 256, 256], 'conv3')
        # 'ceil mode' pool: pad so 75 -> 38
        x = nn.max_pool(x, (2, 2), strides=(2, 2),
                        padding=[(0, x.shape[1] % 2), (0, x.shape[2] % 2)])
        x = convs(x, [512, 512, 512], 'conv4')
        conv4_3 = L2Norm(self.l2_norm_scale, name='l2_norm')(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = convs(x, [512, 512, 512], 'conv5')
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
        # dilated fc6 + fc7
        x = nn.relu(nn.Conv(1024, (3, 3), padding=[(6, 6)] * 2,
                            kernel_dilation=(6, 6), dtype=d, name='fc6')(x))
        fc7 = nn.relu(nn.Conv(1024, (1, 1), dtype=d, name='fc7')(x))

        # extra layers: 1x1 squeeze + 3x3/2 (or valid) expand.
        # 300: strides [2,2,v,v] -> 4 extra levels (6 total);
        # 512: strides [2,2,2,2] + a final 4x4 pad-1 conv collapsing the
        # 2x2 map to 1x1 -> 5 extra levels (7 total) — reference
        # backbones/ssd_vgg.py extra_setting + the input_size==512 branch.
        outs = [conv4_3, fc7]
        x = fc7
        if self.input_size == 512:
            extra_cfg = [(256, 512, 2), (128, 256, 2), (128, 256, 2),
                         (128, 256, 2)]
        else:
            extra_cfg = [(256, 512, 2), (128, 256, 2), (128, 256, 1),
                         (128, 256, 1)]
        for i, (sq, ex, stride) in enumerate(extra_cfg):
            x = nn.relu(nn.Conv(sq, (1, 1), dtype=d,
                                name=f'extra{i}_1')(x))
            pad = [(1, 1)] * 2 if stride == 2 else 'VALID'
            x = nn.relu(nn.Conv(ex, (3, 3), strides=(stride, stride),
                                padding=pad, dtype=d,
                                name=f'extra{i}_2')(x))
            outs.append(x)
        if self.input_size == 512:
            x = nn.relu(nn.Conv(128, (1, 1), dtype=d, name='extra4_1')(x))
            x = nn.relu(nn.Conv(256, (4, 4), padding=[(1, 1)] * 2, dtype=d,
                                name='extra4_2')(x))
            outs.append(x)
        return tuple(outs)

    def frozen_param_paths(self):
        return []
