"""Box coders.

Parity: /root/reference/mmdet/core/bbox/coder/delta_xywh_bbox_coder.py
(DeltaXYWHBBoxCoder — Faster-R-CNN delta encoding with target mean/std
normalization and wh clamping) and pseudo_bbox_coder.py.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

from ld_tpu.utils.registry import IOU_CALCULATORS  # reuse a registry? no

CODERS = {}


def register_coder(cls):
    CODERS[cls.__name__] = cls
    return cls


def build_coder(cfg):
    cfg = dict(cfg)
    return CODERS[cfg.pop('type')](**cfg)


@register_coder
class DeltaXYWHBBoxCoder:

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.), clip_border=True):
        self.means = jnp.asarray(target_means)
        self.stds = jnp.asarray(target_stds)
        self.clip_border = clip_border

    def encode(self, bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray):
        """(dx, dy, dw, dh) of gt relative to proposal boxes."""
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = jnp.maximum(bboxes[..., 2] - bboxes[..., 0], 1e-6)
        ph = jnp.maximum(bboxes[..., 3] - bboxes[..., 1], 1e-6)
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = jnp.maximum(gt_bboxes[..., 2] - gt_bboxes[..., 0], 1e-6)
        gh = jnp.maximum(gt_bboxes[..., 3] - gt_bboxes[..., 1], 1e-6)
        deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                            jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
        return (deltas - self.means) / self.stds

    def decode(self, bboxes: jnp.ndarray, deltas: jnp.ndarray,
               max_shape=None, wh_ratio_clip=16 / 1000):
        deltas = deltas * self.stds + self.means
        max_ratio = abs(math.log(wh_ratio_clip))
        dx, dy = deltas[..., 0], deltas[..., 1]
        dw = jnp.clip(deltas[..., 2], -max_ratio, max_ratio)
        dh = jnp.clip(deltas[..., 3], -max_ratio, max_ratio)
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        gx = px + pw * dx
        gy = py + ph * dy
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        x1, y1 = gx - gw * 0.5, gy - gh * 0.5
        x2, y2 = gx + gw * 0.5, gy + gh * 0.5
        if max_shape is not None and self.clip_border:
            h = jnp.asarray(max_shape[..., 0])
            w = jnp.asarray(max_shape[..., 1])
            if hasattr(h, 'ndim') and h.ndim >= 1 and x1.ndim > h.ndim:
                h = jnp.expand_dims(h, tuple(range(h.ndim, x1.ndim)))
                w = jnp.expand_dims(w, tuple(range(w.ndim, x1.ndim)))
            x1 = jnp.clip(x1, 0, w)
            y1 = jnp.clip(y1, 0, h)
            x2 = jnp.clip(x2, 0, w)
            y2 = jnp.clip(y2, 0, h)
        return jnp.stack([x1, y1, x2, y2], axis=-1)


@register_coder
class PseudoBBoxCoder:
    def encode(self, bboxes, gt_bboxes):
        return gt_bboxes

    def decode(self, bboxes, pred, max_shape=None):
        return pred


@register_coder
class TBLRBBoxCoder:
    """Top-Bottom-Left-Right coder (FSAF). Parity:
    /root/reference/mmdet/core/bbox/coder/tblr_bbox_coder.py."""

    def __init__(self, normalizer=4.0, clip_border=True):
        self.normalizer = normalizer
        self.clip_border = clip_border

    def encode(self, bboxes, gt_bboxes):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = jnp.maximum(bboxes[..., 2] - bboxes[..., 0], 1e-6)
        h = jnp.maximum(bboxes[..., 3] - bboxes[..., 1], 1e-6)
        t = (py - gt_bboxes[..., 1]) / (h * self.normalizer)
        b = (gt_bboxes[..., 3] - py) / (h * self.normalizer)
        l = (px - gt_bboxes[..., 0]) / (w * self.normalizer)
        r = (gt_bboxes[..., 2] - px) / (w * self.normalizer)
        return jnp.stack([t, b, l, r], axis=-1)

    def decode(self, bboxes, deltas, max_shape=None):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        t, b, l, r = (deltas[..., 0], deltas[..., 1], deltas[..., 2],
                      deltas[..., 3])
        x1 = px - l * w * self.normalizer
        x2 = px + r * w * self.normalizer
        y1 = py - t * h * self.normalizer
        y2 = py + b * h * self.normalizer
        out = jnp.stack([x1, y1, x2, y2], axis=-1)
        if max_shape is not None and self.clip_border:
            hh, ww = max_shape[..., 0], max_shape[..., 1]
            out = jnp.stack([
                jnp.clip(out[..., 0], 0, ww), jnp.clip(out[..., 1], 0, hh),
                jnp.clip(out[..., 2], 0, ww), jnp.clip(out[..., 3], 0, hh)
            ], axis=-1)
        return out
