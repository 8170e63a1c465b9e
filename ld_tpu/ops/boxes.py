"""Box geometry primitives (pure jnp, fully shape-static, batch-friendly).

Semantics match the reference toolbox:
  - bbox_overlaps:  /root/reference/mmdet/core/bbox/iou_calculators/iou2d_calculator.py:43
    (modes iou / iof / giou / diou; the fork adds diou for VLR assignment)
  - distance2bbox / bbox2distance: /root/reference/mmdet/core/bbox/transforms.py:119,159
All functions broadcast over arbitrary leading batch dims and are designed to
be called under jit/vmap; no data-dependent shapes anywhere.
"""
from __future__ import annotations

import jax.numpy as jnp


def bbox_overlaps(bboxes1: jnp.ndarray,
                  bboxes2: jnp.ndarray,
                  mode: str = 'iou',
                  is_aligned: bool = False,
                  eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise (or aligned) overlap between two box sets in xyxy format.

    Args:
        bboxes1: (..., m, 4)
        bboxes2: (..., n, 4)  (n == m when is_aligned)
        mode: 'iou' | 'iof' | 'giou' | 'diou' | 'ciou'
    Returns:
        (..., m, n) overlaps, or (..., m) when is_aligned.
    """
    assert mode in ('iou', 'iof', 'giou', 'diou', 'ciou'), mode
    area1 = (bboxes1[..., 2] - bboxes1[..., 0]) * (
        bboxes1[..., 3] - bboxes1[..., 1])
    area2 = (bboxes2[..., 2] - bboxes2[..., 0]) * (
        bboxes2[..., 3] - bboxes2[..., 1])

    if not is_aligned:
        bboxes1 = bboxes1[..., :, None, :]
        bboxes2 = bboxes2[..., None, :, :]
        area1 = area1[..., :, None]
        area2 = area2[..., None, :]

    lt = jnp.maximum(bboxes1[..., :2], bboxes2[..., :2])
    rb = jnp.minimum(bboxes1[..., 2:], bboxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    overlap = wh[..., 0] * wh[..., 1]

    if mode == 'iof':
        union = area1 if is_aligned else jnp.broadcast_to(area1, overlap.shape)
    else:
        union = area1 + area2 - overlap
    union = jnp.maximum(union, eps)
    ious = overlap / union

    if mode in ('iou', 'iof'):
        return ious

    enclosed_lt = jnp.minimum(bboxes1[..., :2], bboxes2[..., :2])
    enclosed_rb = jnp.maximum(bboxes1[..., 2:], bboxes2[..., 2:])
    enclose_wh = jnp.clip(enclosed_rb - enclosed_lt, 0)

    if mode == 'giou':
        enclose_area = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], eps)
        return ious - (enclose_area - union) / enclose_area

    # diou / ciou: centre-distance penalty over enclosing-box diagonal
    rho2 = (((bboxes2[..., 0] + bboxes2[..., 2]) -
             (bboxes1[..., 0] + bboxes1[..., 2]))**2 +
            ((bboxes2[..., 1] + bboxes2[..., 3]) -
             (bboxes1[..., 1] + bboxes1[..., 3]))**2) / 4.0
    enclose_c2 = jnp.maximum(enclose_wh[..., 0]**2 + enclose_wh[..., 1]**2, eps)
    dious = ious - rho2 / enclose_c2
    if mode == 'diou':
        return dious

    # ciou adds the aspect-ratio consistency term (Zheng et al., AAAI 2020);
    # matches /root/reference/mmdet/models/losses/iou_loss.py:402 (CIoULoss).
    w1 = bboxes1[..., 2] - bboxes1[..., 0]
    h1 = jnp.maximum(bboxes1[..., 3] - bboxes1[..., 1], eps)
    w2 = bboxes2[..., 2] - bboxes2[..., 0]
    h2 = jnp.maximum(bboxes2[..., 3] - bboxes2[..., 1], eps)
    factor = 4.0 / (jnp.pi**2)
    v = factor * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1))**2
    # alpha is treated as a constant w.r.t. gradients (per the CIoU paper)
    import jax
    alpha = jax.lax.stop_gradient(v / jnp.maximum(1.0 - ious + v, eps))
    return dious - alpha * v


def anchor_center(anchors: jnp.ndarray) -> jnp.ndarray:
    """Centres (..., 2) of xyxy anchors (..., 4).

    Reference: /root/reference/mmdet/models/dense_heads/gfl_head.py:185.
    """
    cx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    cy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    return jnp.stack([cx, cy], axis=-1)


def distance2bbox(points: jnp.ndarray,
                  distance: jnp.ndarray,
                  max_shape=None) -> jnp.ndarray:
    """Decode (left, top, right, bottom) distances at `points` into xyxy boxes.

    Args:
        points: (..., 2)
        distance: (..., 4)
        max_shape: optional (H, W) clamp — scalar pair or per-batch array.
    """
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        max_shape = jnp.asarray(max_shape, dtype=x1.dtype)
        h = max_shape[..., 0]
        w = max_shape[..., 1]
        # broadcast (B,) image bounds against (B, N) coordinates if needed
        if max_shape.ndim >= 1 and x1.ndim > max_shape.ndim - 1:
            h = jnp.expand_dims(h, axis=tuple(range(h.ndim, x1.ndim)))
            w = jnp.expand_dims(w, axis=tuple(range(w.ndim, x1.ndim)))
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2distance(points: jnp.ndarray,
                  bbox: jnp.ndarray,
                  max_dis: float = None,
                  eps: float = 0.1) -> jnp.ndarray:
    """Encode xyxy boxes as (left, top, right, bottom) distances from points."""
    left = points[..., 0] - bbox[..., 0]
    top = points[..., 1] - bbox[..., 1]
    right = bbox[..., 2] - points[..., 0]
    bottom = bbox[..., 3] - points[..., 1]
    out = jnp.stack([left, top, right, bottom], axis=-1)
    if max_dis is not None:
        out = jnp.clip(out, 0, max_dis - eps)
    return out


def bbox_flip(bboxes: jnp.ndarray, img_shape, direction='horizontal'):
    """Flip boxes inside an image of shape (H, W)."""
    h, w = img_shape[0], img_shape[1]
    x1, y1, x2, y2 = (bboxes[..., 0], bboxes[..., 1], bboxes[..., 2],
                      bboxes[..., 3])
    if direction == 'horizontal':
        return jnp.stack([w - x2, y1, w - x1, y2], axis=-1)
    elif direction == 'vertical':
        return jnp.stack([x1, h - y2, x2, h - y1], axis=-1)
    else:
        raise ValueError(direction)
