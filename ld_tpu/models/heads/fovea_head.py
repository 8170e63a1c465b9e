"""FoveaBox head (anchor-free, log-space corner regression).

Parity: /root/reference/mmdet/models/dense_heads/fovea_head.py:341 —
per-level scale ranges route each gt to one pyramid level; the positive
region is the sigma-shrunk gt box; each positive cell regresses
log((cell-centre - corner) / base_edge) clamped to [1/16, 16]; SmoothL1 on
the log-space offsets + focal cls. When several gts cover a cell the
SMALLEST-area gt wins (the reference iterates gts sorted by descending area
so later/smaller writes overwrite).
"""
from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops.nms import multiclass_nms, topk_flat
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import ConvGNBlock, _CLS_BIAS_INIT, flatten_levels

INF = 1e8
DEFAULT_SCALE_RANGES = ((1, 64), (32, 128), (64, 256), (128, 512),
                        (256, 2048))
DEFAULT_BASE_EDGES = (16, 32, 64, 128, 256)


class FoveaHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    # FoveaBox-align (reference fovea_head.py FeatureAlign): a
    # zero-initialized 1x1 conv maps exp(bbox_pred) to per-tap DCN offsets
    # that warp the cls tower onto the predicted fovea before scoring
    with_deform: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cls_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                 name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                 name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               _CLS_BIAS_INIT), name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        if self.with_deform:
            from ld_tpu.ops.deform_conv import DeformConv
            align_offset = nn.Conv(
                18, (1, 1), dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name='align_offset')
            align_conv = DeformConv(self.feat_channels, dtype=self.dtype,
                                    name='feature_align')
        cls_scores, bbox_preds = [], []
        for x in feats:
            c, r = x, x
            for conv in cls_convs:
                c = conv(c)
            for conv in reg_convs:
                r = conv(r)
            reg = conv_reg(r).astype(jnp.float32)
            if self.with_deform:
                off = align_offset(jnp.exp(jnp.clip(reg, -8.0, 8.0)))
                c = nn.relu(align_conv(c, off))
            cls_scores.append(conv_cls(c).astype(jnp.float32))
            bbox_preds.append(reg)
        return cls_scores, bbox_preds


@HEADS.register_module()
class FoveaHead:

    def __init__(self, num_classes=80, in_channels=256, feat_channels=256,
                 stacked_convs=4, strides=(8, 16, 32, 64, 128),
                 base_edge_list=DEFAULT_BASE_EDGES,
                 scale_ranges=DEFAULT_SCALE_RANGES, sigma=0.4,
                 with_deform=False, loss_cls=None, loss_bbox=None,
                 train_cfg=None, test_cfg=None, dtype=jnp.float32,
                 **kwargs):
        self.num_classes = num_classes
        self.cls_out_channels = num_classes
        self.strides = tuple(strides)
        self.base_edges = tuple(base_edge_list)
        self.scale_ranges = tuple(tuple(r) for r in scale_ranges)
        self.sigma = sigma
        self.loss_cls = LOSSES.build(loss_cls or dict(
            type='FocalLoss', use_sigmoid=True, gamma=1.5, alpha=0.4,
            loss_weight=1.0))
        self.loss_bbox = LOSSES.build(loss_bbox or dict(
            type='SmoothL1Loss', beta=0.11, loss_weight=0.75))
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(
            nms_pre=1000, score_thr=0.05,
            nms=dict(type='nms', iou_threshold=0.5), max_per_img=100)
        self.net = FoveaHeadNet(num_classes=num_classes,
                                feat_channels=feat_channels,
                                stacked_convs=stacked_convs,
                                with_deform=with_deform, dtype=dtype)

    def _level_points(self, featmap_sizes):
        pts, lvl_id = [], []
        for lvl, (h, w) in enumerate(featmap_sizes):
            s = self.strides[lvl]
            xs = np.tile((np.arange(w) + 0.5) * s, h)
            ys = np.repeat((np.arange(h) + 0.5) * s, w)
            pts.append(np.stack([xs, ys], -1).astype(np.float32))
            lvl_id.append(np.full(h * w, lvl, np.int32))
        return (jnp.asarray(np.concatenate(pts)),
                jnp.asarray(np.concatenate(lvl_id)))

    def _targets_single(self, points, lvl_id, gtb, gtl, gtv):
        """Dense FoveaBox assignment for one image."""
        n = points.shape[0]
        g = gtb.shape[0]
        w = gtb[:, 2] - gtb[:, 0]
        h = gtb[:, 3] - gtb[:, 1]
        edge = jnp.sqrt(jnp.maximum(w * h, 1e-6))
        lo = jnp.asarray([r[0] for r in self.scale_ranges])[lvl_id]
        hi = jnp.asarray([r[1] for r in self.scale_ranges])[lvl_id]
        in_range = (edge[None, :] >= lo[:, None]) & \
            (edge[None, :] <= hi[:, None])                       # (N, G)
        cx = (gtb[:, 0] + gtb[:, 2]) / 2
        cy = (gtb[:, 1] + gtb[:, 3]) / 2
        sx1 = cx - 0.5 * self.sigma * w
        sx2 = cx + 0.5 * self.sigma * w
        sy1 = cy - 0.5 * self.sigma * h
        sy2 = cy + 0.5 * self.sigma * h
        px = points[:, 0:1]
        py = points[:, 1:2]
        inside = (px >= sx1[None, :]) & (px <= sx2[None, :]) & \
            (py >= sy1[None, :]) & (py <= sy2[None, :])
        cand = inside & in_range & gtv[None, :]
        # smallest gt wins
        areas = jnp.where(cand, (w * h)[None, :], INF)
        best = areas.argmin(axis=1)
        pos = areas.min(axis=1) < INF / 2
        labels = jnp.where(pos, gtl[best], self.num_classes)
        base = jnp.asarray(self.base_edges, jnp.float32)[lvl_id]
        gb = gtb[best]
        t = jnp.stack([
            (px[:, 0] - gb[:, 0]) / base,
            (py[:, 0] - gb[:, 1]) / base,
            (gb[:, 2] - px[:, 0]) / base,
            (gb[:, 3] - py[:, 0]) / base,
        ], -1)
        t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
        return labels, jnp.where(pos[:, None], t, 0.0), pos

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds = outputs
        points, lvl_id = self._level_points(featmap_sizes)
        labels, targets, pos = jax.vmap(
            lambda b, l, v: self._targets_single(points, lvl_id, b, l, v))(
                batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'])
        cls_flat = flatten_levels(cls_scores).astype(jnp.float32)
        reg_flat = flatten_levels(bbox_preds).astype(jnp.float32)
        posf = pos.astype(jnp.float32)
        num_pos = jnp.maximum(posf.sum(), 1.0)
        loss_cls = self.loss_cls(cls_flat, labels, avg_factor=num_pos)
        loss_bbox = self.loss_bbox(
            reg_flat.reshape(-1, 4), targets.reshape(-1, 4),
            weight=jnp.repeat(posf.reshape(-1, 1), 4, 1),
            avg_factor=num_pos * 4.0)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, bbox_preds = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        nms_pre = cfg.get('nms_pre', 1000)
        lvl_sizes = [h * w for h, w in featmap_sizes]
        points, _ = self._level_points(featmap_sizes)

        def per_image(cls_list, reg_list, hw, sf):
            boxes_all, scores_all = [], []
            lo = 0
            for lvl in range(len(featmap_sizes)):
                n_lvl = lvl_sizes[lvl]
                base = float(self.base_edges[lvl])
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1, self.cls_out_channels))
                t = jnp.exp(jnp.clip(reg_list[lvl].reshape(-1, 4), -4, 4))
                pts = points[lo:lo + n_lvl]
                if nms_pre > 0 and n_lvl > nms_pre:
                    _, topk = topk_flat(scores.max(-1), nms_pre)
                    scores, t, pts = scores[topk], t[topk], pts[topk]
                x1 = jnp.clip(pts[:, 0] - t[:, 0] * base, 0, hw[1])
                y1 = jnp.clip(pts[:, 1] - t[:, 1] * base, 0, hw[0])
                x2 = jnp.clip(pts[:, 0] + t[:, 2] * base, 0, hw[1])
                y2 = jnp.clip(pts[:, 1] + t[:, 3] * base, 0, hw[0])
                boxes_all.append(jnp.stack([x1, y1, x2, y2], -1))
                scores_all.append(scores)
                lo += n_lvl
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(boxes, scores, cfg.get('score_thr', 0.05),
                                  cfg.get('nms', {}).get('iou_threshold',
                                                         0.5),
                                  max_per_img=cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)([c for c in cls_scores],
                                   [r for r in bbox_preds], img_hw,
                                   scale_factor)
