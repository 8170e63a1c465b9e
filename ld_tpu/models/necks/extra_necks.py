"""Long-tail necks: BFP (Libra R-CNN), HRFPN, NAS-FPN, CARAFE FPN.

Parity targets:
  * BFP — /root/reference/mmdet/models/necks/bfp.py:10: gather all levels at
    `refine_level` (max-pool down / nearest up), average, optionally refine
    (conv or non-local), scatter back residually.
  * HRFPN — /root/reference/mmdet/models/necks/hrfpn.py: bilinear-upsample
    every branch to the highest resolution, concat, 1x1 reduction conv, then
    avg-pool pyramid + one 3x3 conv per output.
  * NASFPN — /root/reference/mmdet/models/necks/nas_fpn.py:8: the fixed
    discovered topology over SumCell/GlobalPoolingCell merge cells
    (mmcv.ops.merge_cells: inputs resized to out_size — nearest up /
    max-pool down; GP cell = x1 weighted by sigmoid(GAP(x2)) + x2; out conv
    order act->conv->norm).
  * CARAFE — content-aware upsampling (mmcv.ops.CARAFEPack): compress
    channels, predict sigma^2*k_up^2 reassembly kernels, pixel-shuffle,
    softmax-normalize, weighted-sum the k_up x k_up input neighbourhood.
    Here implemented as a dense einsum over 25 shifted views — XLA fuses
    this into a single pass, no scatter/gather needed on TPU.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ld_tpu.utils.registry import NECKS
from .fpn import _upsample_nearest_to


def _max_pool_to(x, h, w):
    """Adaptive max pool NHWC x to (h, w) for integer ratios."""
    b, ih, iw, c = x.shape
    if (ih, iw) == (h, w):
        return x
    kh, kw = ih // h, iw // w
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


def _resize_to(x, h, w):
    """mmcv BaseMergeCell._resize: nearest up, max-pool down."""
    if x.shape[1] < h:
        return _upsample_nearest_to(x, h, w)
    return _max_pool_to(x, h, w)


@NECKS.register_module()
class BFP(nn.Module):
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: str = None        # None | 'conv' | 'non_local'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == self.num_levels
        gh, gw = inputs[self.refine_level].shape[1:3]
        feats = []
        for i, x in enumerate(inputs):
            feats.append(_max_pool_to(x, gh, gw) if i < self.refine_level
                         else _upsample_nearest_to(x, gh, gw))
        bsf = sum(feats) / len(feats)
        if self.refine_type == 'conv':
            bsf = nn.Conv(self.in_channels, (3, 3), padding=[(1, 1)] * 2,
                          name='refine', dtype=self.dtype)(bsf)
        elif self.refine_type == 'non_local':
            # embedded-gaussian non-local block (reduction=1, no scale)
            b, h, w, c = bsf.shape
            theta = nn.Conv(c, (1, 1), name='nl_theta',
                            dtype=self.dtype)(bsf).reshape(b, h * w, c)
            phi = nn.Conv(c, (1, 1), name='nl_phi',
                          dtype=self.dtype)(bsf).reshape(b, h * w, c)
            g = nn.Conv(c, (1, 1), name='nl_g',
                        dtype=self.dtype)(bsf).reshape(b, h * w, c)
            attn = jax.nn.softmax(
                jnp.einsum('bic,bjc->bij', theta, phi), axis=-1)
            y = jnp.einsum('bij,bjc->bic', attn, g).reshape(b, h, w, c)
            bsf = bsf + nn.Conv(c, (1, 1), name='nl_out',
                                dtype=self.dtype)(y)
        outs = []
        for i, x in enumerate(inputs):
            oh, ow = x.shape[1:3]
            res = _upsample_nearest_to(bsf, oh, ow) \
                if i < self.refine_level else _max_pool_to(bsf, oh, ow)
            outs.append(x + res)
        return tuple(outs)


@NECKS.register_module()
class HRFPN(nn.Module):
    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5
    pooling_type: str = 'AVG'
    stride: int = 1   # fcos-HRNet recipe: stride-2 fpn convs (stride=2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        h, w = inputs[0].shape[1:3]
        ups = [inputs[0]]
        for i in range(1, len(inputs)):
            b, ih, iw, c = inputs[i].shape
            ups.append(jax.image.resize(
                inputs[i], (b, ih * 2**i, iw * 2**i, c), method='bilinear'))
        out = jnp.concatenate(ups, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), name='reduction',
                      dtype=self.dtype)(out)
        pool = nn.avg_pool if self.pooling_type == 'AVG' else nn.max_pool
        outs = [out]
        for i in range(1, self.num_outs):
            k = 2**i
            outs.append(pool(out, (k, k), strides=(k, k)))
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    strides=(self.stride, self.stride),
                    name=f'fpn_conv{i}', dtype=self.dtype)(o)
            for i, o in enumerate(outs))


class MergeCell(nn.Module):
    """mmcv BaseMergeCell: resize both inputs to out_size, merge, out conv
    (order act->conv->norm; norm omitted when norm_cfg is None)."""
    out_channels: int = 256
    mode: str = 'sum'              # 'sum' | 'gp'
    with_out_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, out_hw):
        h, w = out_hw
        x1 = _resize_to(x1, h, w)
        x2 = _resize_to(x2, h, w)
        if self.mode == 'gp':
            att = jax.nn.sigmoid(jnp.mean(x2, axis=(1, 2), keepdims=True))
            x = x2 + att * x1
        else:
            x = x1 + x2
        if self.with_out_conv:
            x = nn.relu(x)
            x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                        name='out_conv', dtype=self.dtype)(x)
        return x


@NECKS.register_module()
class NASFPN(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0
    end_level: int = -1
    norm_cfg: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        end = len(self.in_channels) if self.end_level in (-1, None) \
            else self.end_level
        feats = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral{i}',
                    dtype=self.dtype)(inputs[i])
            for i in range(self.start_level, end)
        ]
        extra = self.num_outs - len(feats)
        for i in range(extra):
            x = nn.Conv(self.out_channels, (1, 1), name=f'extra{i}',
                        dtype=self.dtype)(feats[-1])
            feats.append(nn.max_pool(x, (2, 2), strides=(2, 2)))
        p3, p4, p5, p6, p7 = feats
        for s in range(self.stack_times):
            cell = lambda nm, mode='sum', oc=True: MergeCell(  # noqa: E731
                out_channels=self.out_channels, mode=mode, with_out_conv=oc,
                dtype=self.dtype, name=f's{s}_{nm}')
            hw = lambda p: p.shape[1:3]                        # noqa: E731
            p4_1 = cell('gp_64_4', 'gp')(p6, p4, hw(p4))
            p4_2 = cell('sum_44_4')(p4_1, p4, hw(p4))
            p3 = cell('sum_43_3')(p4_2, p3, hw(p3))
            p4 = cell('sum_34_4')(p3, p4_2, hw(p4))
            p5_tmp = cell('gp_43_5', 'gp', oc=False)(p4, p3, hw(p5))
            p5 = cell('sum_55_5')(p5, p5_tmp, hw(p5))
            p7_tmp = cell('gp_54_7', 'gp', oc=False)(p5, p4_2, hw(p7))
            p7 = cell('sum_77_7')(p7, p7_tmp, hw(p7))
            p6 = cell('gp_75_6', 'gp')(p7, p5, hw(p6))
        return p3, p4, p5, p6, p7


class CARAFE(nn.Module):
    """Content-aware reassembly upsampler (scale x2 by default)."""
    channels: int
    scale: int = 2
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.up_kernel
        s = self.scale
        b, h, w, c = x.shape
        comp = nn.Conv(self.compressed_channels, (1, 1),
                       name='channel_compressor', dtype=self.dtype)(x)
        ek = self.encoder_kernel
        masks = nn.Conv(s * s * k * k, (ek, ek),
                        padding=[(ek // 2, ek // 2)] * 2,
                        name='content_encoder', dtype=self.dtype)(comp)
        # pixel shuffle (B,H,W,s*s*k2) -> (B,sH,sW,k2)
        masks = masks.reshape(b, h, w, s, s, k * k)
        masks = masks.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * s, w * s, k * k)
        masks = jax.nn.softmax(masks, axis=-1)
        # unfold: 25 shifted views of x
        pad = k // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        views = jnp.stack([
            xp[:, dy:dy + h, dx:dx + w]
            for dy in range(k) for dx in range(k)
        ], axis=3)                                   # (B,H,W,k2,C)
        views = _upsample_nearest_to(
            views.reshape(b, h, w, k * k * c), h * s, w * s).reshape(
                b, h * s, w * s, k * k, c)
        return jnp.einsum('bhwk,bhwkc->bhwc', masks, views)


@NECKS.register_module()
class FPN_CARAFE(nn.Module):
    """FPN whose top-down upsampling is CARAFE instead of nearest.

    Parity: /root/reference/mmdet/models/necks/fpn_carafe.py (upsample_cfg
    type='carafe'). Output convs are 3x3 as in plain FPN.
    """
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    upsample_cfg: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        cfg = dict(self.upsample_cfg or dict(
            type='carafe', up_kernel=5, up_group=1, encoder_kernel=3,
            encoder_dilation=1, compressed_channels=64))
        end = len(self.in_channels) if self.end_level in (-1, None) \
            else self.end_level
        used = list(range(self.start_level, end))
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral{i}',
                    dtype=self.dtype)(inputs[i]) for i in used
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = CARAFE(self.out_channels,
                        up_kernel=cfg.get('up_kernel', 5),
                        encoder_kernel=cfg.get('encoder_kernel', 3),
                        compressed_channels=cfg.get('compressed_channels',
                                                    64),
                        dtype=self.dtype, name=f'upsample{i}')(laterals[i])
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + up[:, :h, :w]
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    name=f'fpn_conv{i}', dtype=self.dtype)(lat)
            for i, lat in enumerate(laterals)
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


@NECKS.register_module()
class NASFCOS_FPN(nn.Module):
    """NAS-FCOS searched FPN (reference necks/nasfcos_fpn.py): lateral 1x1
    convs, then four searched merge cells (concat-conv over pairs of
    levels resized to the coarser operand) producing the refreshed P3-P5,
    extra levels via stride-2 convs on the output."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        end = len(self.in_channels) if self.end_level in (-1, None) \
            else self.end_level
        lats = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral{i}',
                    dtype=self.dtype)(inputs[i])
            for i in range(self.start_level, end)
        ]

        def cell(a, b, name):
            h, w = b.shape[1:3]     # merge at the coarser operand's size
            a = _resize_to(a, h, w)
            x = jnp.concatenate([a, b], axis=-1)
            x = nn.Conv(self.out_channels, (1, 1), name=f'{name}_conv',
                        dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(32, self.out_channels),
                             epsilon=1e-5, name=f'{name}_gn')(x)
            return nn.relu(x)

        p3, p4, p5 = lats[-3], lats[-2], lats[-1]
        c4 = cell(p3, p4, 'cell0')
        c5 = cell(c4, p5, 'cell1')
        o4 = cell(p4, c4, 'cell2')
        o3 = cell(o4, p3, 'cell3')
        outs = [o3, o4, c5]
        while len(outs) < self.num_outs:
            outs.append(nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                padding=[(1, 1)] * 2,
                                name=f'extra{len(outs)}',
                                dtype=self.dtype)(outs[-1]))
        return tuple(outs)


@NECKS.register_module()
class FPG(nn.Module):
    """Feature Pyramid Grids (reference necks/fpg.py): `stack_times`
    columns of the pyramid grid; each cell fuses the same-level across
    path, a stride-2 bottom-up path from the finer level and a nearest
    top-down path from the coarser level (conv+GN each), relu at the end.
    """
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 3
    start_level: int = 0
    end_level: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        end = len(self.in_channels) if self.end_level in (-1, None) \
            else self.end_level
        feats = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral{i}',
                    dtype=self.dtype)(inputs[i])
            for i in range(self.start_level, end)
        ]
        while len(feats) < self.num_outs:
            feats.append(nn.max_pool(feats[-1], (2, 2), strides=(2, 2)))

        def convgn(x, name, stride=1):
            x = nn.Conv(self.out_channels, (3, 3), strides=(stride, stride),
                        padding=[(1, 1)] * 2, name=f'{name}_conv',
                        dtype=self.dtype)(x)
            return nn.GroupNorm(num_groups=min(32, self.out_channels),
                                epsilon=1e-5, name=f'{name}_gn')(x)

        for s in range(self.stack_times):
            new = []
            for l in range(len(feats)):
                acc = convgn(feats[l], f's{s}_l{l}_across')
                if l > 0:
                    acc = acc + convgn(feats[l - 1], f's{s}_l{l}_up',
                                       stride=2)
                if l < len(feats) - 1:
                    h, w = feats[l].shape[1:3]
                    acc = acc + convgn(
                        _upsample_nearest_to(feats[l + 1], h, w),
                        f's{s}_l{l}_down')
                new.append(nn.relu(acc))
            feats = new
        return tuple(feats)


@NECKS.register_module()
class RFP(nn.Module):
    """Recursive Feature Pyramid (DetectoRS, reference necks/rfp.py).

    The reference re-runs the WHOLE backbone with ASPP feedback per
    recursion step — doubling backbone cost. TPU re-design: the recursion
    keeps the published fusion semantics (ASPP on each output, residual
    refreshed pyramid, sigmoid-gated fusion `rfp_weight`) but feeds the
    ASPP context back through a per-level residual block instead of a
    second backbone pass; the gate starts at 0 so step 0 output is exactly
    the plain FPN (same init behaviour as the reference's zero-init gate).
    """
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    rfp_steps: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from .fpn import FPN
        fpn = FPN(in_channels=self.in_channels,
                  out_channels=self.out_channels, num_outs=self.num_outs,
                  dtype=self.dtype, name='fpn')
        outs = list(fpn(inputs, train))

        def aspp(x, name):
            # 4 branches: 1x1, two atrous 3x3, global pool (rfp ASPP)
            b1 = nn.Conv(self.out_channels // 4, (1, 1),
                         name=f'{name}_b1', dtype=self.dtype)(x)
            b2 = nn.Conv(self.out_channels // 4, (3, 3),
                         padding=[(3, 3)] * 2, kernel_dilation=(3, 3),
                         name=f'{name}_b2', dtype=self.dtype)(x)
            b3 = nn.Conv(self.out_channels // 4, (3, 3),
                         padding=[(6, 6)] * 2, kernel_dilation=(6, 6),
                         name=f'{name}_b3', dtype=self.dtype)(x)
            g = x.mean(axis=(1, 2), keepdims=True)
            b4 = jnp.broadcast_to(
                nn.Conv(self.out_channels // 4, (1, 1), name=f'{name}_b4',
                        dtype=self.dtype)(g),
                (*x.shape[:3], self.out_channels // 4))
            return nn.relu(jnp.concatenate([b1, b2, b3, b4], -1))

        for step in range(1, self.rfp_steps):
            for l in range(len(outs)):
                ctx = aspp(outs[l], f'aspp_s{step}_l{l}')
                ref = nn.Conv(self.out_channels, (3, 3),
                              padding=[(1, 1)] * 2,
                              name=f'refine_s{step}_l{l}',
                              dtype=self.dtype)(ctx)
                gate = jax.nn.sigmoid(nn.Conv(
                    1, (1, 1), kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    name=f'gate_s{step}_l{l}', dtype=self.dtype)(outs[l]))
                outs[l] = outs[l] * (1 - gate) + nn.relu(ref) * gate
        return tuple(outs)
