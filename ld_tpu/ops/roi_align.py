"""RoIAlign as a pure-jnp bilinear sampler (TPU gather path).

Replaces the mmcv CUDA RoIAlign kernel
(/root/reference/mmdet/models/roi_heads/roi_extractors/ uses mmcv.ops.RoIAlign;
SURVEY.md §2.4). Semantics follow the 'aligned' RoIAlign of Detectron2 /
mmcv: the roi is divided into out_h x out_w bins, `sampling_ratio` sample
points per bin axis, bilinear interpolation with the half-pixel offset,
averaged per bin.

Static shapes: every image contributes a FIXED number of (padded) rois; the
gather indices are data-dependent values but the shapes never change, so the
whole extractor jits once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(features: jnp.ndarray, rois: jnp.ndarray, out_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """Args:
        features: (H, W, C) one image's feature map.
        rois: (R, 4) xyxy in image coordinates.
    Returns:
        (R, out_size, out_size, C)
    """
    h, w, c = features.shape
    offset = 0.5 if aligned else 0.0
    boxes = rois * spatial_scale - offset          # feature coords
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1e-3)
    roi_h = jnp.maximum(y2 - y1, 1e-3)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    s = sampling_ratio
    # sample grid: out_size*s points per axis, centred in sub-bins
    grid = (jnp.arange(out_size * s) + 0.5) / s    # in bin units
    sx = x1[:, None] + grid[None, :] * bin_w[:, None]   # (R, S)
    sy = y1[:, None] + grid[None, :] * bin_h[:, None]

    def bilinear(img, ys, xs):
        """img (H, W, C); ys (S,), xs (S,) -> (S, S, C) sampled grid."""
        y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
        y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        wy1 = jnp.clip(ys - y0, 0.0, 1.0)
        wx1 = jnp.clip(xs - x0, 0.0, 1.0)
        wy0 = 1.0 - wy1
        wx0 = 1.0 - wx1
        # gather rows then columns (separable)
        r0 = img[y0i]                      # (S, W, C)
        r1 = img[y1i]
        g00 = r0[:, x0i]                   # (S, S, C)
        g01 = r0[:, x1i]
        g10 = r1[:, x0i]
        g11 = r1[:, x1i]
        return (g00 * (wy0[:, None, None] * wx0[None, :, None]) +
                g01 * (wy0[:, None, None] * wx1[None, :, None]) +
                g10 * (wy1[:, None, None] * wx0[None, :, None]) +
                g11 * (wy1[:, None, None] * wx1[None, :, None]))

    def one_roi(ys, xs):
        samples = bilinear(features, ys, xs)         # (S*o, S*o, C)
        return samples.reshape(out_size, s, out_size, s, c).mean(axis=(1, 3))

    return jax.vmap(one_roi)(sy, sx)


def roi_align_offsets(features, rois, offsets, out_size=7,
                      spatial_scale=1.0, sampling_ratio=2, gamma=0.1):
    """Deformable RoIAlign: per-bin learned 2D offsets on the sample grid.

    Parity: mmcv DeformRoIPool ("Deformable ConvNets v2", arXiv:1811.11168)
    used by the reference's dpool/mdpool configs — sample positions of bin
    (i, j) shift by gamma * offset * (roi_w, roi_h).

    Args:
        features: (H, W, C) one image's feature map.
        rois: (R, 4) xyxy in image coordinates.
        offsets: (R, out_size, out_size, 2) normalized (dx, dy) per bin.
    Returns:
        (R, out_size, out_size, C)
    """
    h, w, c = features.shape
    boxes = rois * spatial_scale - 0.5
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1e-3)
    roi_h = jnp.maximum(y2 - y1, 1e-3)
    s = sampling_ratio
    grid = (jnp.arange(out_size * s) + 0.5) / s    # bin units
    sx = x1[:, None] + grid[None, :] * (roi_w / out_size)[:, None]
    sy = y1[:, None] + grid[None, :] * (roi_h / out_size)[:, None]
    # per-sample offsets: expand each bin's offset over its s x s samples
    off = jnp.repeat(jnp.repeat(offsets, s, axis=1), s, axis=2)  # (R,S,S,2)
    off_x = off[..., 0] * (gamma * roi_w)[:, None, None]
    off_y = off[..., 1] * (gamma * roi_h)[:, None, None]

    def one_roi(ys, xs, oy, ox):
        YS = ys[:, None] + oy                       # (S, S)
        XS = xs[None, :] + ox
        y0 = jnp.clip(jnp.floor(YS), 0, h - 1)
        x0 = jnp.clip(jnp.floor(XS), 0, w - 1)
        y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        wy1 = jnp.clip(YS - y0, 0.0, 1.0)[..., None]
        wx1 = jnp.clip(XS - x0, 0.0, 1.0)[..., None]
        g = (features[y0i, x0i] * (1 - wy1) * (1 - wx1) +
             features[y0i, x1i] * (1 - wy1) * wx1 +
             features[y1i, x0i] * wy1 * (1 - wx1) +
             features[y1i, x1i] * wy1 * wx1)        # (S, S, C)
        return g.reshape(out_size, s, out_size, s, c).mean(axis=(1, 3))

    return jax.vmap(one_roi)(sy, sx, off_y, off_x)


def multi_level_roi_align(feats, rois, roi_valid, out_size=7,
                          featmap_strides=(4, 8, 16, 32),
                          finest_scale=56, sampling_ratio=2):
    """FPN-aware RoIAlign (SingleRoIExtractor semantics,
    /root/reference/mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py):
    each roi reads the level floor(log2(sqrt(area)/finest_scale)); computed
    for ALL levels then masked — static shapes, no scatter.

    Args:
        feats: list of (H_l, W_l, C) maps for ONE image.
        rois: (R, 4); roi_valid: (R,) bool.
    Returns:
        (R, out_size, out_size, C)
    """
    areas = jnp.maximum((rois[:, 2] - rois[:, 0]) *
                        (rois[:, 3] - rois[:, 1]), 1e-6)
    target = jnp.floor(jnp.log2(jnp.sqrt(areas) / finest_scale + 1e-6))
    target = jnp.clip(target, 0, len(featmap_strides) - 1).astype(jnp.int32)

    out = None
    for lvl, stride in enumerate(featmap_strides):
        pooled = roi_align(feats[lvl], rois, out_size, 1.0 / stride,
                           sampling_ratio)
        mask = ((target == lvl) & roi_valid)[:, None, None, None]
        out = pooled * mask if out is None else out + pooled * mask
    return out


def multi_level_roi_align_offsets(feats, rois, roi_valid, offsets,
                                  out_size=7, featmap_strides=(4, 8, 16, 32),
                                  finest_scale=56, sampling_ratio=2,
                                  gamma=0.1):
    """Level-routed deformable RoIAlign (dpool/mdpool second pass)."""
    areas = jnp.maximum((rois[:, 2] - rois[:, 0]) *
                        (rois[:, 3] - rois[:, 1]), 1e-6)
    target = jnp.floor(jnp.log2(jnp.sqrt(areas) / finest_scale + 1e-6))
    target = jnp.clip(target, 0, len(featmap_strides) - 1).astype(jnp.int32)
    out = None
    for lvl, stride in enumerate(featmap_strides):
        pooled = roi_align_offsets(feats[lvl], rois, offsets, out_size,
                                   1.0 / stride, sampling_ratio, gamma)
        mask = ((target == lvl) & roi_valid)[:, None, None, None]
        out = pooled * mask if out is None else out + pooled * mask
    return out
