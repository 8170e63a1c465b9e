"""Anchor generation for multi-level dense heads (static shapes, NHWC order).

Behavioural parity with the reference generator
(/root/reference/mmdet/core/anchor/anchor_generator.py:10): base anchors from
octave scales x ratios centred at `center_offset * stride`, shifted over the
feature grid row-major (so anchor i*W+j sits at pixel (j*stride, i*stride)).

TPU-first differences: everything is precomputed as jnp constants per
(featmap_sizes) tuple — anchors are compile-time constants folded into the
jitted step, never regenerated per iteration.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class AnchorGenerator:
    """Multi-level grid anchors in xyxy.

    Args:
        strides: per-level stride (int or (sx, sy)).
        ratios: h/w aspect ratios.
        scales: explicit scales, or use octave_base_scale/scales_per_octave.
        octave_base_scale, scales_per_octave: scales = base * 2**(i/n).
        center_offset: anchor centre relative to the cell origin, in strides.
    """

    def __init__(self,
                 strides: Sequence,
                 ratios: Sequence[float] = (1.0, ),
                 scales: Sequence[float] = None,
                 base_sizes: Sequence[int] = None,
                 octave_base_scale: int = None,
                 scales_per_octave: int = None,
                 centers=None,
                 center_offset: float = 0.0):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s)
                        for s in strides]
        self.base_sizes = ([min(s) for s in self.strides]
                           if base_sizes is None else list(base_sizes))
        if scales is not None:
            self.scales = np.array(scales, dtype=np.float32)
        elif octave_base_scale is not None and scales_per_octave is not None:
            octave_scales = np.array(
                [2**(i / scales_per_octave) for i in range(scales_per_octave)],
                dtype=np.float32)
            self.scales = octave_scales * octave_base_scale
        else:
            raise ValueError('either scales or octave_base_scale with '
                             'scales_per_octave must be set')
        self.octave_base_scale = octave_base_scale
        self.scales_per_octave = scales_per_octave
        self.ratios = np.array(ratios, dtype=np.float32)
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = [
            self._single_level_base_anchors(bs, i)
            for i, bs in enumerate(self.base_sizes)
        ]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    def _single_level_base_anchors(self, base_size: float,
                                   level: int) -> np.ndarray:
        w = h = float(base_size)
        if self.centers is not None:
            x_c, y_c = self.centers[level]
        else:
            x_c = self.center_offset * w
            y_c = self.center_offset * h
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        # scale-major ordering: ratio-blocks of consecutive scales
        ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        return np.stack([x_c - 0.5 * ws, y_c - 0.5 * hs,
                         x_c + 0.5 * ws, y_c + 0.5 * hs], axis=-1)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]
                     ) -> List[jnp.ndarray]:
        """All anchors per level, each (H*W*A, 4), row-major grid order."""
        assert len(featmap_sizes) == self.num_levels
        out = []
        for lvl, (feat_h, feat_w) in enumerate(featmap_sizes):
            sx, sy = self.strides[lvl]
            shift_x = np.arange(feat_w, dtype=np.float32) * sx
            shift_y = np.arange(feat_h, dtype=np.float32) * sy
            xx = np.tile(shift_x, feat_h)
            yy = np.repeat(shift_y, feat_w)
            shifts = np.stack([xx, yy, xx, yy], axis=-1)  # (H*W, 4)
            anchors = (self.base_anchors[lvl][None, :, :] +
                       shifts[:, None, :]).reshape(-1, 4)
            out.append(jnp.asarray(anchors))
        return out

    def num_level_anchors(self, featmap_sizes) -> List[int]:
        return [
            h * w * a for (h, w), a in zip(featmap_sizes,
                                           self.num_base_anchors)
        ]

    def valid_flags(self, featmap_sizes, img_hw) -> List[jnp.ndarray]:
        """Per-level (H*W*A,) bool flags: anchor cell inside the *image*
        region of a padded batch tensor. `img_hw` may be traced (per-image
        dynamic values) — the computation is mask-based, shapes stay static.

        Reference: /root/reference/mmdet/core/anchor/anchor_generator.py:272.
        """
        h = jnp.asarray(img_hw[0], jnp.float32)
        w = jnp.asarray(img_hw[1], jnp.float32)
        flags = []
        for lvl, (feat_h, feat_w) in enumerate(featmap_sizes):
            sx, sy = self.strides[lvl]
            valid_w = jnp.minimum(jnp.ceil(w / sx), feat_w)
            valid_h = jnp.minimum(jnp.ceil(h / sy), feat_h)
            ix = jnp.arange(feat_w, dtype=jnp.float32)
            iy = jnp.arange(feat_h, dtype=jnp.float32)
            vx = ix < valid_w
            vy = iy < valid_h
            grid = (vy[:, None] & vx[None, :]).reshape(-1)
            a = self.num_base_anchors[lvl]
            flags.append(jnp.repeat(grid, a) if a > 1 else grid)
        return flags


class PointGenerator:
    """Per-level grid points (x, y, stride) for point-based (FCOS-style) heads.

    Reference: /root/reference/mmdet/core/anchor/point_generator.py.
    """

    def grid_points(self, featmap_size, stride):
        feat_h, feat_w = featmap_size
        shift_x = np.arange(feat_w, dtype=np.float32) * stride
        shift_y = np.arange(feat_h, dtype=np.float32) * stride
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        s = np.full_like(xx, stride)
        return jnp.asarray(np.stack([xx, yy, s], axis=-1))


class LegacyAnchorGenerator(AnchorGenerator):
    """MMDetection V1.x anchor layout (anchor_generator.py:474): centers at
    0.5 offset computed on (size - 1) extents, corners quantized. Kept for
    configs that load V1-era checkpoints (e.g. legacy SSD/RetinaNet)."""

    def _single_level_base_anchors(self, base_size, level):
        import numpy as np
        w = h = float(base_size)
        x_center = 0.5 * (w - 1)
        y_center = 0.5 * (h - 1)
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        anchors = np.stack([
            x_center - 0.5 * (ws - 1), y_center - 0.5 * (hs - 1),
            x_center + 0.5 * (ws - 1), y_center + 0.5 * (hs - 1)
        ], axis=-1)
        return np.round(anchors)
