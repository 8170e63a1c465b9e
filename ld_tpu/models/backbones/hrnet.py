"""HRNet backbone (parallel multi-resolution streams with exchange units).

Parity: /root/reference/mmdet/models/backbones/hrnet.py:198 — stem of two
3x3/2 convs, a Bottleneck stage1, then transitions that add one
half-resolution branch per stage and HRModules whose fuse layers exchange
information across branches (1x1 conv + nearest x2^k upsample going up;
chains of stride-2 3x3 convs going down, ReLU on all but the last).
Returns the final feature map of every branch (fed to HRFPN).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import BACKBONES
from .resnet import BasicBlock, BatchNorm, Bottleneck, _conv

# hrnetv2_w18/w32/w40 layouts (mmdet configs pass these via `extra`)
DEFAULT_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                num_blocks=(4, ), num_channels=(64, )),
    stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                num_blocks=(4, 4), num_channels=(32, 64)),
    stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
    stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                num_blocks=(4, 4, 4, 4), num_channels=(32, 64, 128, 256)))


def _upsample_nearest(x, factor):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class HRModule(nn.Module):
    num_branches: int
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]
    block: str = 'BASIC'
    multiscale_output: bool = True
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        block_cls = BasicBlock if self.block == 'BASIC' else Bottleneck
        ys = []
        for i in range(self.num_branches):
            x = xs[i]
            for b in range(self.num_blocks[i]):
                need_ds = (b == 0 and x.shape[-1] != self.num_channels[i] *
                           getattr(block_cls, 'expansion', 1))
                x = block_cls(self.num_channels[i], stride=1,
                              downsample=need_ds, norm_eval=self.norm_eval,
                              dtype=self.dtype,
                              name=f'branch{i}_block{b}')(x, train)
            ys.append(x)
        if self.num_branches == 1:
            return ys
        n_out = self.num_branches if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            acc = ys[i]
            for j in range(self.num_branches):
                if j == i:
                    continue
                z = ys[j]
                if j > i:   # upsample j -> i
                    z = nn.Conv(ys[i].shape[-1], (1, 1), use_bias=False,
                                name=f'fuse{i}_{j}_conv',
                                dtype=self.dtype)(z)
                    z = BatchNorm(use_running_average=self.norm_eval,
                                  name=f'fuse{i}_{j}_norm',
                                  dtype=self.dtype)(z, train)
                    z = _upsample_nearest(z, 2**(j - i))
                else:       # downsample chain j -> i
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = ys[i].shape[-1] if last else ys[j].shape[-1]
                        z = nn.Conv(ch, (3, 3), strides=(2, 2),
                                    padding=[(1, 1)] * 2, use_bias=False,
                                    name=f'fuse{i}_{j}_down{k}_conv',
                                    dtype=self.dtype)(z)
                        z = BatchNorm(use_running_average=self.norm_eval,
                                      name=f'fuse{i}_{j}_down{k}_norm',
                                      dtype=self.dtype)(z, train)
                        if not last:
                            z = nn.relu(z)
                acc = acc + z
            fused.append(nn.relu(acc))
        return fused


@BACKBONES.register_module()
class HRNet(nn.Module):
    extra: Dict[str, Any] = None
    norm_eval: bool = True
    norm_cfg: dict = None
    frozen_stages: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = self.extra or DEFAULT_EXTRA
        # stem: two 3x3/2 convs
        for i in (1, 2):
            x = _conv(64, 3, 2, f'conv{i}', self.dtype)(x)
            x = BatchNorm(use_running_average=self.norm_eval,
                          name=f'norm{i}', dtype=self.dtype)(x, train)
            x = nn.relu(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        # stage 1 (bottleneck layer)
        s1 = extra['stage1']
        ch1 = s1['num_channels'][0]
        block_cls = Bottleneck if s1['block'] == 'BOTTLENECK' else BasicBlock
        exp = getattr(block_cls, 'expansion', 1)
        for b in range(s1['num_blocks'][0]):
            need_ds = b == 0 and x.shape[-1] != ch1 * exp
            x = block_cls(ch1, stride=1, downsample=need_ds,
                          norm_eval=self.norm_eval, dtype=self.dtype,
                          name=f'layer1_{b}')(x, train)

        xs = [x]
        for stage_idx in (2, 3, 4):
            cfg = extra[f'stage{stage_idx}']
            tgt_ch = list(cfg['num_channels'])
            blk = cfg['block']
            exp = 4 if blk == 'BOTTLENECK' else 1
            tgt_full = [c * exp for c in tgt_ch]
            # transition: adapt existing branches, create the new one
            new_xs = []
            for i in range(cfg['num_branches']):
                if i < len(xs):
                    z = xs[i]
                    if z.shape[-1] != tgt_full[i]:
                        z = nn.Conv(tgt_full[i], (3, 3),
                                    padding=[(1, 1)] * 2, use_bias=False,
                                    name=f'transition{stage_idx-1}_{i}_conv',
                                    dtype=self.dtype)(z)
                        z = BatchNorm(
                            use_running_average=self.norm_eval,
                            name=f'transition{stage_idx-1}_{i}_norm',
                            dtype=self.dtype)(z, train)
                        z = nn.relu(z)
                    new_xs.append(z)
                else:
                    z = xs[-1]
                    for j in range(i + 1 - len(xs)):
                        out_ch = tgt_full[i] if j == i - len(xs) \
                            else z.shape[-1]
                        z = nn.Conv(
                            out_ch, (3, 3), strides=(2, 2),
                            padding=[(1, 1)] * 2, use_bias=False,
                            name=f'transition{stage_idx-1}_{i}_down{j}_conv',
                            dtype=self.dtype)(z)
                        z = BatchNorm(
                            use_running_average=self.norm_eval,
                            name=f'transition{stage_idx-1}_{i}_down{j}_norm',
                            dtype=self.dtype)(z, train)
                        z = nn.relu(z)
                    new_xs.append(z)
            xs = new_xs
            for m in range(cfg['num_modules']):
                xs = HRModule(
                    num_branches=cfg['num_branches'],
                    num_blocks=tuple(cfg['num_blocks']),
                    num_channels=tuple(cfg['num_channels']), block=blk,
                    multiscale_output=True, norm_eval=self.norm_eval,
                    dtype=self.dtype,
                    name=f'stage{stage_idx}_module{m}')(xs, train)
        return tuple(xs)

    def frozen_param_paths(self):
        return ['conv1', 'norm1', 'conv2', 'norm2'] \
            if self.frozen_stages >= 0 else []
