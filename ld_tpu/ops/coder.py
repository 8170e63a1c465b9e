"""Box coders.

Parity: /root/reference/mmdet/core/bbox/coder/delta_xywh_bbox_coder.py
(DeltaXYWHBBoxCoder — Faster-R-CNN delta encoding with target mean/std
normalization and wh clamping) and pseudo_bbox_coder.py.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
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
class LegacyDeltaXYWHBBoxCoder(DeltaXYWHBBoxCoder):
    """MMDet V1.x delta coder (reference core/bbox/coder/
    legacy_delta_xywh_bbox_coder.py:10): identical to DeltaXYWHBBoxCoder
    except widths/heights use the legacy `+ 1` pixel convention (and the
    decode intentionally OMITS the matching -+0.5 corner shift, matching
    the reference's compatibility note at :203)."""

    def encode(self, bboxes, gt_bboxes):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0] + 1.0
        ph = bboxes[..., 3] - bboxes[..., 1] + 1.0
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0] + 1.0
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1] + 1.0
        deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                            jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
        return (deltas - self.means) / self.stds

    def decode(self, bboxes, deltas, max_shape=None, wh_ratio_clip=16 / 1000):
        deltas = deltas * self.stds + self.means
        max_ratio = abs(math.log(wh_ratio_clip))
        dx, dy = deltas[..., 0], deltas[..., 1]
        dw = jnp.clip(deltas[..., 2], -max_ratio, max_ratio)
        dh = jnp.clip(deltas[..., 3], -max_ratio, max_ratio)
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0] + 1.0
        ph = bboxes[..., 3] - bboxes[..., 1] + 1.0
        gx = px + pw * dx
        gy = py + ph * dy
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        x1, y1 = gx - gw * 0.5, gy - gh * 0.5
        x2, y2 = gx + gw * 0.5, gy + gh * 0.5
        if max_shape is not None and self.clip_border:
            x1 = jnp.clip(x1, 0, max_shape[1] - 1)
            y1 = jnp.clip(y1, 0, max_shape[0] - 1)
            x2 = jnp.clip(x2, 0, max_shape[1] - 1)
            y2 = jnp.clip(y2, 0, max_shape[0] - 1)
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


def bbox_rescale(bboxes, scale_factor=1.0):
    """Rescale boxes about their centers."""
    cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    w = (bboxes[..., 2] - bboxes[..., 0]) * scale_factor
    h = (bboxes[..., 3] - bboxes[..., 1]) * scale_factor
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


@register_coder
class BucketingBBoxCoder:
    """Side-aware bucketing coder (SABL).

    Parity: /root/reference/mmdet/core/bbox/coder/bucketing_bbox_coder.py:12
    — encode returns (offsets, offset_weights, bucket one-hot labels,
    bucket cls weights) each of shape (N, 4*side_num); decode applies the
    argmax bucket + its fine offset per side and returns (boxes,
    localization confidence = mean over sides of top1(+adjacent top2)
    softmax score).
    """

    def __init__(self, num_buckets=14, scale_factor=1.7, offset_topk=2,
                 offset_upperbound=1.0, cls_ignore_neighbor=True,
                 clip_border=True):
        self.num_buckets = num_buckets
        self.side_num = int(math.ceil(num_buckets / 2.0))
        self.scale_factor = scale_factor
        self.offset_topk = offset_topk
        self.offset_upperbound = offset_upperbound
        self.cls_ignore_neighbor = cls_ignore_neighbor
        self.clip_border = clip_border

    def _buckets(self, proposals):
        p = bbox_rescale(proposals, self.scale_factor)
        pw = p[..., 2] - p[..., 0]
        ph = p[..., 3] - p[..., 1]
        # clamp: zero-size PADDED rois otherwise produce inf offsets whose
        # 0-weight in the loss still yields 0*inf = NaN
        bw = jnp.maximum(pw / self.num_buckets, 1e-6)
        bh = jnp.maximum(ph / self.num_buckets, 1e-6)
        steps = 0.5 + jnp.arange(self.side_num, dtype=jnp.float32)
        l = p[..., 0:1] + steps * bw[..., None]
        r = p[..., 2:3] - steps * bw[..., None]
        t = p[..., 1:2] + steps * bh[..., None]
        d = p[..., 3:4] - steps * bh[..., None]
        return bw, bh, l, r, t, d

    def encode(self, proposals, gt):
        bw, bh, l, r, t, d = self._buckets(proposals)
        offs = [(l - gt[..., 0:1]) / bw[..., None],
                (r - gt[..., 2:3]) / bw[..., None],
                (t - gt[..., 1:2]) / bh[..., None],
                (d - gt[..., 3:4]) / bh[..., None]]
        off_ws, labels_1h, cls_ws = [], [], []
        for o in offs:
            a = jnp.abs(o)
            # top-k nearest buckets get regression supervision; k>=1 ones
            # only when within offset_upperbound
            order = jnp.argsort(a, axis=-1)
            w = jnp.zeros_like(o)
            for k in range(self.offset_topk):
                idx = order[..., k]
                val = jnp.take_along_axis(a, idx[..., None], -1)[..., 0]
                ok = 1.0 if k == 0 else \
                    (val < self.offset_upperbound).astype(o.dtype)
                w = w + jax.nn.one_hot(idx, self.side_num, dtype=o.dtype) * \
                    (ok if k == 0 else ok[..., None])
            off_ws.append(jnp.minimum(w, 1.0))
            lab = jax.nn.one_hot(order[..., 0], self.side_num, dtype=o.dtype)
            labels_1h.append(lab)
            # ignore near-miss neighbours for the bucket classifier
            if self.cls_ignore_neighbor:
                cw = jnp.where((a < 1.0) & (lab == 0.0), 0.0, 1.0)
            else:
                cw = jnp.ones_like(a)
            cls_ws.append(cw)
        cat = lambda xs: jnp.concatenate(xs, axis=-1)  # noqa: E731
        return (cat(offs), cat(off_ws), cat(labels_1h), cat(cls_ws))

    def decode(self, proposals, pred, max_shape=None):
        cls_preds, offset_preds = pred
        shp = proposals.shape[:-1]
        bw, bh, l, r, t, d = self._buckets(proposals)
        cls4 = cls_preds.reshape(*shp, 4, self.side_num)
        off4 = offset_preds.reshape(*shp, 4, self.side_num)
        scores = jax.nn.softmax(cls4, axis=-1)
        top2, lab2 = jax.lax.top_k(scores, 2)
        best = lab2[..., 0]                                # (..., 4)
        buckets = jnp.stack([
            jnp.take_along_axis(b, best[..., i:i + 1], -1)[..., 0]
            for i, b in enumerate((l, r, t, d))], -1)      # (..., 4)
        best_off = jnp.take_along_axis(off4, best[..., None], -1)[..., 0]
        x1 = buckets[..., 0] - best_off[..., 0] * bw
        x2 = buckets[..., 1] - best_off[..., 1] * bw
        y1 = buckets[..., 2] - best_off[..., 2] * bh
        y2 = buckets[..., 3] - best_off[..., 3] * bh
        if self.clip_border and max_shape is not None:
            hh, ww = max_shape[..., 0], max_shape[..., 1]
            x1 = jnp.clip(x1, 0, ww - 1)
            x2 = jnp.clip(x2, 0, ww - 1)
            y1 = jnp.clip(y1, 0, hh - 1)
            y2 = jnp.clip(y2, 0, hh - 1)
        boxes = jnp.stack([x1, y1, x2, y2], -1)
        # bucketing-guided rescoring
        conf = top2[..., 0] + top2[..., 1] * \
            (jnp.abs(lab2[..., 0] - lab2[..., 1]) == 1).astype(top2.dtype)
        return boxes, conf.mean(axis=-1)
