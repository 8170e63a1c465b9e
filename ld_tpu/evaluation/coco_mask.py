"""COCO polygon/RLE mask utilities with pycocotools-exact semantics.

The reference scores mask AP through pycocotools
(/root/reference/mmdet/datasets/coco.py:363, metric='segm'), whose polygon
rasterization (maskApi.c rleFrPoly) differs from a naive cv2.fillPoly on
boundary pixels — enough to flip IoU matches at high thresholds and move
mask AP. This module implements the same published algorithm (5x-upsampled
boundary walk -> column-major y-crossings -> even/odd runs) so GT masks
rasterize bit-identically to what the published numbers were scored
against. Polygon coords are continuous, pixel (i, j) covers
[i, i+1) x [j, j+1): an axis-aligned square from (1, 1) to (3, 3) fills
exactly the 2x2 pixels whose indices are 1..2 (area 4).

Crowd annotations come as RLE dicts: `decode_segmentation` handles both
uncompressed ({'counts': [..ints..], 'size': [h, w]}) and compressed
(LEB128-style string, via evaluation.segm_eval.rle_decode) forms.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def _poly_runs(xy: np.ndarray, h: int, w: int) -> np.ndarray:
    """Column-major RLE runs (first run counts zeros) for ONE polygon —
    the maskApi.c rleFrPoly algorithm."""
    scale = 5.0
    k = len(xy) // 2
    x = np.floor(scale * xy[0::2] + .5).astype(np.int64)
    y = np.floor(scale * xy[1::2] + .5).astype(np.int64)
    x = np.concatenate([x, x[:1]])
    y = np.concatenate([y, y[:1]])

    # dense integer points along the (upsampled) boundary, edge by edge
    us, vs = [], []
    for j in range(k):
        xs, xe, ys, ye = int(x[j]), int(x[j + 1]), int(y[j]), int(y[j + 1])
        dx, dy = abs(xe - xs), abs(ys - ye)
        flip = (dx >= dy and xs > xe) or (dx < dy and ys > ye)
        if flip:
            xs, xe, ys, ye = xe, xs, ye, ys
        if dx >= dy:
            s = (ye - ys) / dx if dx else 0.0
            d = np.arange(dx + 1)
            t = (dx - d) if flip else d
            us.append(t + xs)
            vs.append(np.floor(ys + s * t + .5).astype(np.int64))
        else:
            s = (xe - xs) / dy if dy else 0.0
            d = np.arange(dy + 1)
            t = (dy - d) if flip else d
            vs.append(t + ys)
            us.append(np.floor(xs + s * t + .5).astype(np.int64))
    u = np.concatenate(us)
    v = np.concatenate(vs)

    # keep boundary points where the x-cell changes; downsample to pixel
    # grid (y is the column crossing, ceil-clipped to [0, h])
    xs_out, ys_out = [], []
    for j in range(1, len(u)):
        if u[j] == u[j - 1]:
            continue
        xd = float(u[j] if u[j] < u[j - 1] else u[j] - 1)
        xd = (xd + .5) / scale - .5
        if np.floor(xd) != xd or xd < 0 or xd > w - 1:
            continue
        yd = float(v[j] if v[j] < v[j - 1] else v[j - 1])
        yd = (yd + .5) / scale - .5
        yd = min(max(yd, 0.0), float(h))
        xs_out.append(int(xd))
        ys_out.append(int(np.ceil(yd)))

    # even/odd fill: sorted column-major crossing positions -> runs
    a = np.asarray(xs_out, np.int64) * h + np.asarray(ys_out, np.int64)
    a = np.concatenate([np.sort(a), [h * w]])
    runs = np.diff(np.concatenate([[0], a]))
    # merge zero-length runs into the previous run (maskApi.c tail)
    b = []
    j = 0
    kk = len(runs)
    b.append(int(runs[0]))
    j = 1
    while j < kk:
        if runs[j] > 0:
            b.append(int(runs[j]))
            j += 1
        else:
            j += 1
            if j < kk:
                b[-1] += int(runs[j])
                j += 1
    return np.asarray(b, np.int64)


def _runs_to_mask(runs: np.ndarray, h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for r in runs:
        if val:
            flat[pos:pos + r] = True
        pos += int(r)
        val = not val
    return flat.reshape((w, h)).T  # column-major


def poly_to_mask(polys: Optional[List], h: int, w: int) -> np.ndarray:
    """Union of the object's polygons as an (h, w) bool mask —
    pycocotools annToMask semantics (frPyObjects + merge)."""
    out = np.zeros((h, w), bool)
    if not polys:
        return out
    for p in polys:
        p = np.asarray(p, np.float64).reshape(-1)
        if len(p) >= 6:
            out |= _runs_to_mask(_poly_runs(p, h, w), h, w)
    return out


def decode_segmentation(seg, h: int, w: int) -> np.ndarray:
    """Any COCO segmentation (polygon list / uncompressed RLE dict /
    compressed RLE dict) -> (h, w) bool mask."""
    if seg is None:
        return np.zeros((h, w), bool)
    if isinstance(seg, list):
        return poly_to_mask(seg, h, w)
    counts = seg.get('counts')
    if isinstance(counts, (list, tuple)):  # uncompressed RLE
        return _runs_to_mask(np.asarray(counts, np.int64),
                             *map(int, seg['size'])) \
            if seg.get('size') else np.zeros((h, w), bool)
    from .segm_eval import rle_decode
    return rle_decode(seg).astype(bool)
