"""Feature Pyramid Network neck (flax, NHWC).

Capability parity with /root/reference/mmdet/models/necks/fpn.py:12:
lateral 1x1 convs + top-down nearest-neighbour upsampling (size-matched, so
odd feature sizes work) + 3x3 output convs; optional extra levels via
stride-2 3x3 convs on input/lateral/output (`add_extra_convs`), or max-pool
when extra convs are disabled. GFL/LD configs use
`add_extra_convs='on_output'`, start_level=1, num_outs=5.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import NECKS


def _upsample_nearest_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbour upsample of NHWC `x` to (h, w).

    For the common exact-2x case this compiles to a cheap broadcast-reshape
    (no gather), which XLA fuses into the following add.
    """
    b, ih, iw, c = x.shape
    if h == 2 * ih and w == 2 * iw:
        x = x[:, :, None, :, None, :]
        x = jnp.broadcast_to(x, (b, ih, 2, iw, 2, c))
        return x.reshape(b, h, w, c)
    return jax.image.resize(x, (b, h, w, c), method='nearest')


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    # None/False | True | 'on_input' / 'on_lateral' / 'on_output'
    add_extra_convs: object = None
    extra_convs_on_inputs: bool = True   # legacy bool form (mmdet <=2.10)
    relu_before_extra_convs: bool = False
    no_norm_on_lateral: bool = False
    conv_cfg: dict = None                # dict(type='ConvWS') for gn+ws
    norm_cfg: dict = None                # e.g. dict(type='GN', num_groups=32)
    dtype: jnp.dtype = jnp.float32

    def _extra_convs_mode(self):
        if self.add_extra_convs is True:
            return 'on_input' if self.extra_convs_on_inputs else 'on_output'
        return self.add_extra_convs or None

    def _cn(self, features, kernel, stride, name, x, train,
            with_norm=True):
        """ConvModule parity: conv (+ norm when norm_cfg is set, which also
        drops the conv bias) — mmcv ConvModule via build_conv/norm_layer."""
        from ld_tpu.models.layers import make_conv, make_norm
        has_norm = self.norm_cfg is not None and with_norm
        x = make_conv(self.conv_cfg, features, kernel, stride,
                      use_bias=not has_norm, name=name, dtype=self.dtype)(x)
        if has_norm:
            x = make_norm(self.norm_cfg, use_running_average=False,
                          name=f'{name}_norm', dtype=self.dtype)(x, train)
        return x

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level in (-1, None) \
            else self.end_level
        used = list(range(self.start_level, end))

        laterals = [
            self._cn(self.out_channels, 1, 1, f'lateral_{i}', inputs[lvl],
                     train, with_norm=not self.no_norm_on_lateral)
            for i, lvl in enumerate(used)
        ]

        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_to(
                laterals[i], h, w)

        outs = [
            self._cn(self.out_channels, 3, 1, f'fpn_conv_{i}', laterals[i],
                     train)
            for i in range(len(laterals))
        ]

        # extra levels
        if self.num_outs > len(outs):
            mode = self._extra_convs_mode()
            if not mode:
                for _ in range(self.num_outs - len(outs)):
                    outs.append(nn.max_pool(outs[-1], (1, 1),
                                            strides=(2, 2)))
            else:
                if mode == 'on_input':
                    extra = inputs[used[-1]]
                elif mode == 'on_lateral':
                    extra = laterals[-1]
                else:  # 'on_output'
                    extra = outs[-1]
                for j in range(self.num_outs - len(outs)):
                    if j > 0 and self.relu_before_extra_convs:
                        extra = nn.relu(extra)
                    extra = self._cn(self.out_channels, 3, 2,
                                     f'fpn_extra_{j}', extra, train)
                    outs.append(extra)
        return tuple(outs)


@NECKS.register_module()
class PAFPN(FPN):
    """Path-Aggregation FPN: FPN + an extra bottom-up path.

    Parity: /root/reference/mmdet/models/necks/pafpn.py.
    """

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level in (-1, None) \
            else self.end_level
        used = list(range(self.start_level, end))

        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral_{i}',
                    dtype=self.dtype)(inputs[lvl])
            for i, lvl in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_to(
                laterals[i], h, w)
        inter = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    name=f'fpn_conv_{i}', dtype=self.dtype)(laterals[i])
            for i in range(len(laterals))
        ]
        # bottom-up augmentation
        for i in range(len(inter) - 1):
            inter[i + 1] = inter[i + 1] + nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=[(1, 1)] * 2, name=f'downsample_conv_{i}',
                dtype=self.dtype)(inter[i])
        outs = [inter[0]] + [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    name=f'pafpn_conv_{i}', dtype=self.dtype)(inter[i])
            for i in range(1, len(inter))
        ]
        if self.num_outs > len(outs):
            mode = self._extra_convs_mode()
            if not mode:
                for _ in range(self.num_outs - len(outs)):
                    outs.append(nn.max_pool(outs[-1], (1, 1),
                                            strides=(2, 2)))
            else:
                extra = inputs[used[-1]] if mode == 'on_input' else outs[-1]
                for j in range(self.num_outs - len(outs)):
                    if j > 0 and self.relu_before_extra_convs:
                        extra = nn.relu(extra)
                    extra = nn.Conv(self.out_channels, (3, 3),
                                    strides=(2, 2), padding=[(1, 1)] * 2,
                                    name=f'fpn_extra_{j}',
                                    dtype=self.dtype)(extra)
                    outs.append(extra)
        return tuple(outs)


@NECKS.register_module()
class ChannelMapper(nn.Module):
    """1x1 convs mapping each input level to a common channel count.

    Parity: /root/reference/mmdet/models/necks/channel_mapper.py.
    """
    in_channels: Sequence[int]
    out_channels: int = 256
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        k = self.kernel_size
        return tuple(
            nn.Conv(self.out_channels, (k, k), padding=[(k // 2, k // 2)] * 2,
                    name=f'map_{i}', dtype=self.dtype)(x)
            for i, x in enumerate(inputs))
