"""Modulated deformable convolution (DCNv2) — TPU-native formulation.

Replaces the mmcv CUDA `DeformConv2d`/`ModulatedDeformConv2d` kernels used by
the reference's DCN teacher backbones (SURVEY.md §2.4; e.g. the
LD R101-DCN->R101 2x row). Instead of a hand-written scatter/gather kernel,
the op is expressed as deformed-im2col + ONE big matmul:

  1. a zero-initialized conv predicts per-tap (dy, dx) offsets and a
     sigmoid modulation mask (DCNv2);
  2. the input is bilinearly sampled at the k*k deformed tap positions
     (4 gathers over the flattened feature map — VPU/HBM work);
  3. the (k*k*Cin) sampled columns contract with the kernel on the MXU.

With zero offsets this reduces exactly to a standard conv, which is the
behavioural test anchor.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """x (H, W, C); ys/xs (P,) float sample coords -> (P, C).

    Out-of-bounds samples contribute zero (mmcv border semantics)."""
    h, w, c = x.shape
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    flat = x.reshape(h * w, c)

    def tap(yi, xi, wgt):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = flat[idx.astype(jnp.int32)]
        return vals * (wgt * ok)[:, None]

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    out = (tap(y0i, x0i, wy0 * wx0) + tap(y0i, x0i + 1, wy0 * wx1) +
           tap(y0i + 1, x0i, wy1 * wx0) + tap(y0i + 1, x0i + 1, wy1 * wx1))
    return out * inside[:, None]


class ModulatedDeformConv(nn.Module):
    """DCNv2 layer (NHWC). Offset/mask conv is zero-initialized so the layer
    starts as a plain conv (mmcv init semantics).

    `groups` is CONV grouping (ResNeXt cardinality — mmdet resnext.py
    builds the DCN conv2 with groups=self.groups), independent of
    `deform_groups` (per-group offset fields). Kernel rows follow the
    grouped-HWIO flattening (tap * (cin/groups) + cin_idx), matching the
    checkpoint converter's `_dcn_kernel`."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    deform_groups: int = 1
    groups: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = (k // 2) * self.dilation
        b, h, w, cin = x.shape
        oh = (h + 2 * pad - self.dilation * (k - 1) - 1) // self.stride + 1
        ow = (w + 2 * pad - self.dilation * (k - 1) - 1) // self.stride + 1
        g = self.deform_groups

        off_mask = nn.Conv(
            g * 3 * k * k, (k, k), strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name='conv_offset')(x)
        off_mask = off_mask.astype(jnp.float32).reshape(
            b, oh, ow, g, 3, k * k)
        off_y = off_mask[..., 0, :]
        off_x = off_mask[..., 1, :]
        mask = jax.nn.sigmoid(off_mask[..., 2, :])       # (b,oh,ow,g,k*k)

        # base tap coordinates
        py = jnp.arange(oh, dtype=jnp.float32) * self.stride - pad
        px = jnp.arange(ow, dtype=jnp.float32) * self.stride - pad
        ky = jnp.repeat(jnp.arange(k, dtype=jnp.float32) * self.dilation, k)
        kx = jnp.tile(jnp.arange(k, dtype=jnp.float32) * self.dilation, k)
        base_y = py[:, None, None] + ky[None, None, :]   # (oh,1,k*k)
        base_x = px[None, :, None] + kx[None, None, :]   # (1,ow,k*k)

        cg = cin // g
        G = self.groups
        weight = self.param(
            'kernel', nn.initializers.he_normal(),
            (k * k * (cin // G), self.features), self.dtype)

        def per_image(xi, oy, ox, m):
            cols = []
            for gi in range(g):
                ys = (base_y + oy[..., gi, :]).reshape(-1)
                xs = (base_x + ox[..., gi, :]).reshape(-1)
                sampled = _bilinear_gather(
                    xi[..., gi * cg:(gi + 1) * cg], ys, xs)
                sampled = sampled.reshape(oh * ow, k * k, cg) * \
                    m[..., gi, :].reshape(oh * ow, k * k, 1)
                cols.append(sampled)
            # (oh*ow, k*k, cin) -> contract on the MXU
            col = jnp.concatenate(cols, axis=-1) if g > 1 else cols[0]
            w32 = weight.astype(jnp.float32)
            if G > 1:
                # grouped contraction: out block gi consumes only its own
                # cin/G input slice (torch grouped-conv semantics)
                cpg, opg = cin // G, self.features // G
                colg = col.reshape(oh * ow, k * k, G, cpg)
                colg = colg.transpose(2, 0, 1, 3).reshape(
                    G, oh * ow, k * k * cpg)
                wg = w32.reshape(k * k * cpg, G, opg).transpose(1, 0, 2)
                out = jnp.einsum('gnc,gco->gno', colg, wg)
                return out.transpose(1, 0, 2).reshape(
                    oh * ow, self.features)
            # reorder to (k*k * cin) matching HWIO conv weight layout
            col = col.reshape(oh * ow, k * k * cin)
            return col @ w32

        out = jax.vmap(per_image)(x.astype(jnp.float32), off_y, off_x, mask)
        out = out.reshape(b, oh, ow, self.features)
        if self.use_bias:
            out = out + self.param('bias', nn.initializers.zeros,
                                   (self.features, ), self.dtype)
        return out.astype(x.dtype)


class DeformConv(nn.Module):
    """DCNv1 with EXTERNALLY supplied offsets (VFNet star DCN, RepPoints).

    `offset` is NHWC (B, H, W, 2*k*k) with (dy, dx) pairs per tap in mmcv
    channel order (y first), ADDED to the regular kernel tap positions.
    No modulation mask; zero offsets reduce to a plain 3x3 conv.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset):
        k = self.kernel_size
        pad = (k // 2) * self.dilation
        b, h, w, cin = x.shape
        oh = (h + 2 * pad - self.dilation * (k - 1) - 1) // self.stride + 1
        ow = (w + 2 * pad - self.dilation * (k - 1) - 1) // self.stride + 1
        off = offset.astype(jnp.float32).reshape(b, oh, ow, k * k, 2)
        off_y = off[..., 0]
        off_x = off[..., 1]

        py = jnp.arange(oh, dtype=jnp.float32) * self.stride - pad
        px = jnp.arange(ow, dtype=jnp.float32) * self.stride - pad
        ky = jnp.repeat(jnp.arange(k, dtype=jnp.float32) * self.dilation, k)
        kx = jnp.tile(jnp.arange(k, dtype=jnp.float32) * self.dilation, k)
        base_y = py[:, None, None] + ky[None, None, :]
        base_x = px[None, :, None] + kx[None, None, :]

        weight = self.param('kernel', nn.initializers.he_normal(),
                            (k * k * cin, self.features), self.dtype)

        def per_image(xi, oy, ox):
            ys = (base_y + oy).reshape(-1)
            xs = (base_x + ox).reshape(-1)
            sampled = _bilinear_gather(xi, ys, xs)
            col = sampled.reshape(oh * ow, k * k * cin)
            return col @ weight.astype(jnp.float32)

        out = jax.vmap(per_image)(x.astype(jnp.float32), off_y, off_x)
        out = out.reshape(b, oh, ow, self.features)
        if self.use_bias:
            out = out + self.param('bias', nn.initializers.zeros,
                                   (self.features, ), self.dtype)
        return out.astype(x.dtype)
