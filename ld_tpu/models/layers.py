"""Shared conv/norm layer factories (conv_cfg / norm_cfg semantics).

The reference threads `conv_cfg=dict(type='ConvWS')` and
`norm_cfg=dict(type='GN'|'BN'|'SyncBN')` through backbones, necks and heads
via mmcv's build_conv_layer / build_norm_layer. Here the same config dicts
select between flax modules:

  * ConvWS (weight-standardized conv, "Weight Standardization"
    arXiv:1903.10520; mmcv conv_ws.py) — per-output-channel standardization
    of the kernel at apply time. Used by configs/gn+ws/.
  * GN — channels-last GroupNorm (torch-compatible eps 1e-5).
  * BN / SyncBN — batch norm with frozen-running-stats detection semantics
    (see backbones/resnet.py BatchNorm). Under pjit SPMD a live BN's batch
    reductions are GLOBAL across the data mesh axis, so `SyncBN` is simply
    BN here — the collective the reference needs NCCL SyncBN for comes out
    of GSPMD automatically.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvWS(nn.Module):
    """Weight-standardized 2D conv (NHWC).

    Kernel is standardized per OUTPUT channel over (kh, kw, cin) with the
    torch-default unbiased std (ddof=1) + eps, matching mmcv ConvWS2d.
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    kernel_dilation: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = True
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        flat = kernel.reshape(-1, self.features)
        mean = flat.mean(axis=0)
        std = flat.std(axis=0, ddof=1) + self.eps
        w = ((kernel - mean) / std).astype(self.dtype)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * 2
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, self.strides, pad,
            rhs_dilation=self.kernel_dilation,
            feature_group_count=self.feature_group_count,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features, ), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class SpaceToDepthStem(nn.Module):
    """ResNet 7x7/s2 stem conv, computed space-to-depth — TPU-fast.

    A 3-input-channel 7x7 conv maps poorly onto the MXU (contraction dim
    147, tiny channel count). Equivalent reformulation: zero-pad the kernel
    to 8x8 at the FRONT, then the stride-2 conv factors exactly into
    (a) a fixed identity 2x2/s2 conv that rearranges the image into a
    (H/2, W/2, 12) space-to-depth layout (the MXU as the data mover — an
    explicit pad/reshape/transpose is 3x slower than this conv), and
    (b) a learned 4x4/s1 conv with contraction dim 192.
    Measured full-stem (conv+BN+relu+maxpool) 1.53 ms vs 2.35 ms direct at
    800x1344 bf16 on one v5e chip (tools/analysis_tools/stem_experiment.py);
    bf16-identical up to one ulp (different summation order).

    The parameter tree is exactly nn.Conv(features, (7, 7), name=...):
    one 'kernel' of shape (7, 7, 3, features) — checkpoints and the
    mmdet2ldtpu converter are unaffected.
    """
    features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import numpy as np
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features), jnp.float32)
        # kernel tap (i, j) must align with input offset (i-3, j-3); the
        # front zero row/col shifts that to (i-4, j-4) for the 8x8 factoring
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w = k8.reshape(4, 2, 4, 2, cin, self.features) \
            .transpose(0, 2, 1, 3, 4, 5) \
            .reshape(4, 4, 4 * cin, self.features).astype(self.dtype)

        eye = np.zeros((2, 2, cin, 4 * cin), np.float32)
        for i in range(2):
            for j in range(2):
                for c in range(cin):
                    eye[i, j, c, (i * 2 + j) * cin + c] = 1.0
        eye = jnp.asarray(eye, self.dtype)

        h, wdt = x.shape[1], x.shape[2]
        oh, ow = (h - 1) // 2 + 1, (wdt - 1) // 2 + 1
        x = x.astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (4, 4 + h % 2), (4, 4 + wdt % 2), (0, 0)))
        xs = jax.lax.conv_general_dilated(
            x, eye, (2, 2), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = jax.lax.conv_general_dilated(
            xs, w, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y[:, :oh, :ow, :]


def make_conv(conv_cfg, features, kernel_size, stride=1, *, padding=None,
              dilation=1, groups=1, use_bias=False, name=None,
              dtype=jnp.float32):
    """build_conv_layer equivalent: nn.Conv by default, ConvWS for
    conv_cfg=dict(type='ConvWS'/'ConvAWS')."""
    k = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
        else tuple(kernel_size)
    if padding is None:
        padding = k[0] // 2
    pad = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    ctype = (conv_cfg or {}).get('type', 'Conv')
    if ctype in ('ConvWS', 'ConvAWS'):
        return ConvWS(features, k, strides=(stride, stride), padding=pad,
                      kernel_dilation=(dilation, dilation),
                      feature_group_count=groups, use_bias=use_bias,
                      name=name, dtype=dtype)
    return nn.Conv(features, k, strides=(stride, stride), padding=pad,
                   kernel_dilation=(dilation, dilation),
                   feature_group_count=groups, use_bias=use_bias,
                   name=name, dtype=dtype)


class GroupNormLayer(nn.Module):
    """GN with the uniform (x, train) call signature used by block code."""
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False   # gamma=0 (zero_init_residual blocks)

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = min(self.num_groups, x.shape[-1])
        return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=self.dtype,
                            scale_init=(nn.initializers.zeros
                                        if self.zero_init
                                        else nn.initializers.ones),
                            name='gn')(x)


def make_norm(norm_cfg, *, use_running_average=True, name=None,
              dtype=jnp.float32, zero_init=False):
    """build_norm_layer equivalent with uniform (x, train) call signature.

    BN/SyncBN -> detection-semantics BatchNorm (frozen stats unless the
    caller passes use_running_average=False); GN -> GroupNormLayer.
    `zero_init` zero-inits gamma (the reference's zero_init_residual on the
    last norm of each residual block).
    """
    t = (norm_cfg or {}).get('type', 'BN')
    if t == 'GN':
        return GroupNormLayer(num_groups=(norm_cfg or {}).get(
            'num_groups', 32), name=name, dtype=dtype,
            zero_init=zero_init)
    from ld_tpu.models.backbones.resnet import BatchNorm
    return BatchNorm(use_running_average=use_running_average, name=name,
                     dtype=dtype, zero_init=zero_init)
