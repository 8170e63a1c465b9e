"""RegNet backbone (quantized linear width schedule, grouped bottlenecks).

Parity: /root/reference/mmdet/models/backbones/regnet.py:11 — arch params
(w0, wa, wm, group_w, depth, bot_mul) generate per-block widths
(`generate_regnet`:221), widths/groups are mutually quantized
(`adjust_width_group`:266), stem is a single 3x3/2 conv (`:207`), and every
stage starts with a stride-2 bottleneck whose expansion is 1.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.utils.registry import BACKBONES
from .resnet import BatchNorm, _conv

ARCH_SETTINGS = {
    'regnetx_400mf':
    dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22, bot_mul=1.0),
    'regnetx_800mf':
    dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16, bot_mul=1.0),
    'regnetx_1.6gf':
    dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18, bot_mul=1.0),
    'regnetx_3.2gf':
    dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25, bot_mul=1.0),
    'regnetx_4.0gf':
    dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23, bot_mul=1.0),
    'regnetx_6.4gf':
    dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17, bot_mul=1.0),
    'regnetx_8.0gf':
    dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23, bot_mul=1.0),
    'regnetx_12gf':
    dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19, bot_mul=1.0),
}


def generate_regnet(w0, wa, wm, depth, divisor=8):
    """Per-block widths from the RegNet linear parameterization."""
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = (np.round(widths / divisor) * divisor).astype(int)
    num_stages = len(np.unique(widths))
    return widths.tolist(), num_stages


def quantize_float(number, divisor):
    return int(round(number / divisor) * divisor)


def adjust_width_group(widths, bottleneck_ratio, groups):
    """Make stage widths divisible by (quantized) group widths."""
    bottleneck_width = [int(w * b) for w, b in zip(widths, bottleneck_ratio)]
    groups = [min(g, w_bot) for g, w_bot in zip(groups, bottleneck_width)]
    bottleneck_width = [
        quantize_float(w_bot, g) for w_bot, g in zip(bottleneck_width, groups)
    ]
    widths = [
        int(w_bot / b) for w_bot, b in zip(bottleneck_width, bottleneck_ratio)
    ]
    return widths, groups


def get_stages_from_blocks(widths):
    """Collapse equal-width runs of blocks into stages."""
    width_diff = [
        w != wp for w, wp in zip(widths + [0], [0] + widths)
    ]
    stage_widths = [w for w, d in zip(widths, width_diff[:-1]) if d]
    stage_blocks = np.diff(
        [i for i, d in enumerate(width_diff) if d]).tolist()
    return stage_widths, stage_blocks


@BACKBONES.register_module()
class RegNet(nn.Module):
    arch: str | dict = 'regnetx_3.2gf'
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Sequence[int] = (2, 2, 2, 2)
    base_channels: int = 32
    frozen_stages: int = -1
    norm_eval: bool = True
    norm_cfg: dict = None
    style: str = 'pytorch'
    dcn: dict = None            # mdconv variants (configs/regnet mdconv)
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dtype: jnp.dtype = jnp.float32

    def _layout(self):
        arch = ARCH_SETTINGS[self.arch] if isinstance(self.arch, str) \
            else dict(self.arch)
        widths, num_stages = generate_regnet(
            arch['w0'], arch['wa'], arch['wm'], arch['depth'])
        stage_widths, stage_blocks = get_stages_from_blocks(widths)
        group_widths = [arch['group_w']] * num_stages
        bot_muls = [arch.get('bot_mul', 1.0)] * num_stages
        stage_widths, group_widths = adjust_width_group(
            stage_widths, bot_muls, group_widths)
        return stage_widths, stage_blocks, group_widths, bot_muls

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_widths, stage_blocks, group_widths, bot_muls = self._layout()
        x = _conv(self.base_channels, 3, 2, 'conv1', self.dtype)(x)
        x = BatchNorm(use_running_average=self.norm_eval, name='norm1',
                      dtype=self.dtype)(x, train)
        x = nn.relu(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        in_ch = self.base_channels
        for stage, (width, blocks, gw, bm) in enumerate(
                zip(stage_widths, stage_blocks, group_widths, bot_muls)):
            bottleneck_width = int(width * bm)
            groups = bottleneck_width // gw
            for b in range(blocks):
                s = self.strides[stage] if b == 0 else 1
                need_ds = b == 0 and (s != 1 or in_ch != width)
                # expansion-1 bottleneck: 1x1 -> grouped 3x3 (stride) -> 1x1
                identity = x
                out = nn.Conv(bottleneck_width, (1, 1), use_bias=False,
                              name=f'layer{stage+1}_{b}_conv1',
                              dtype=self.dtype)(x)
                out = BatchNorm(use_running_average=self.norm_eval,
                                name=f'layer{stage+1}_{b}_norm1',
                                dtype=self.dtype)(out, train)
                out = nn.relu(out)
                if self.dcn is not None and self.stage_with_dcn[stage]:
                    # mdconv: modulated DCN on the 3x3, with the channel
                    # grouping kept INSIDE the DCN exactly like the
                    # reference (mmcv build_conv_layer(dcn, ...,
                    # groups=groups)) — grouped kernels match converted
                    # RegNetX-DCN checkpoints leaf-for-leaf
                    from ld_tpu.ops.deform_conv import ModulatedDeformConv
                    out = ModulatedDeformConv(
                        bottleneck_width, kernel_size=3, stride=s,
                        deform_groups=self.dcn.get('deform_groups', 1),
                        groups=groups,
                        dtype=self.dtype,
                        name=f'layer{stage+1}_{b}_conv2')(out)
                else:
                    out = nn.Conv(bottleneck_width, (3, 3), strides=(s, s),
                                  padding=[(1, 1)] * 2,
                                  feature_group_count=groups,
                                  use_bias=False,
                                  name=f'layer{stage+1}_{b}_conv2',
                                  dtype=self.dtype)(out)
                out = BatchNorm(use_running_average=self.norm_eval,
                                name=f'layer{stage+1}_{b}_norm2',
                                dtype=self.dtype)(out, train)
                out = nn.relu(out)
                out = nn.Conv(width, (1, 1), use_bias=False,
                              name=f'layer{stage+1}_{b}_conv3',
                              dtype=self.dtype)(out)
                out = BatchNorm(use_running_average=self.norm_eval,
                                name=f'layer{stage+1}_{b}_norm3',
                                dtype=self.dtype)(out, train)
                if need_ds:
                    identity = nn.Conv(
                        width, (1, 1), strides=(s, s), use_bias=False,
                        name=f'layer{stage+1}_{b}_downsample_conv',
                        dtype=self.dtype)(x)
                    identity = BatchNorm(
                        use_running_average=self.norm_eval,
                        name=f'layer{stage+1}_{b}_downsample_norm',
                        dtype=self.dtype)(identity, train)
                x = nn.relu(out + identity)
                in_ch = width
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)

    def frozen_param_paths(self):
        paths = []
        if self.frozen_stages >= 0:
            paths += ['conv1', 'norm1']
        for stage in range(1, self.frozen_stages + 1):
            paths.append(f'layer{stage}_')
        return paths
