"""RepPoints head (two-stage point-set representation with DCN).

Parity: /root/reference/mmdet/models/dense_heads/reppoints_head.py:14 —
an init branch regresses 9 (y, x) point offsets; those offsets (partially
detached by gradient_mul, minus the regular 3x3 grid) drive the deformable
cls and refine convs; refine offsets add to the detached init points.
Points convert to boxes via 'minmax' / 'partial_minmax' / 'moment'
(learnable log-half-extent transfer, moment_mul-damped; torch.std is
unbiased — ddof=1 here). Init stage supervises against PointAssigner
targets, refine stage against MaxIoU assignment over the init boxes;
SmoothL1 on boxes normalized by point_base_scale * stride
(`loss_single:530`).
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ld_tpu.ops.deform_conv import DeformConv
from ld_tpu.ops.extra_assigners import PointAssigner
from ld_tpu.ops.max_iou_assigner import MaxIoUAssigner
from ld_tpu.ops.nms import multiclass_nms, topk_flat
from ld_tpu.utils.registry import HEADS, LOSSES
from .gfl_head import ConvGNBlock, _CLS_BIAS_INIT


def points2bbox_shifts(pts, method, moment_transfer=None, moment_mul=0.01):
    """(..., 2*P) y-first point shifts -> (..., 4) box in shift units."""
    shp = pts.shape[:-1]
    p = pts.reshape(*shp, -1, 2)
    py, px = p[..., 0], p[..., 1]
    if method in ('minmax', 'partial_minmax'):
        if method == 'partial_minmax':
            py, px = py[..., :4], px[..., :4]
        return jnp.stack([px.min(-1), py.min(-1), px.max(-1), py.max(-1)],
                         -1)
    # moment
    my = py.mean(-1)
    mx = px.mean(-1)
    n = py.shape[-1]
    corr = n / max(n - 1, 1)
    sy = jnp.sqrt(((py - my[..., None])**2).mean(-1) * corr + 1e-12)
    sx = jnp.sqrt(((px - mx[..., None])**2).mean(-1) * corr + 1e-12)
    mt = moment_transfer * moment_mul + \
        jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul)
    hw = sx * jnp.exp(mt[0])
    hh = sy * jnp.exp(mt[1])
    return jnp.stack([mx - hw, my - hh, mx + hw, my + hh], -1)


def gen_grid_from_reg(reg, prev_box, k):
    """Grid-point parameterization (use_grid_points): a 4-channel box
    regression [dx, dy, dlog_w, dlog_h] relative to `prev_box` becomes a
    k x k point grid on the regressed box.

    Parity: reference reppoints_head.py gen_grid_from_reg — same
    (y, x)-interleaved point layout as the dcn base offsets (y slowest).

    Args:
        reg: (..., 4); prev_box: (..., 4) x1y1x2y2, grid units.
    Returns:
        pts: (..., 2*k*k) y-first interleaved; box: (..., 4).
    """
    bxy = (prev_box[..., :2] + prev_box[..., 2:]) * 0.5
    bwh = jnp.maximum(prev_box[..., 2:] - prev_box[..., :2], 1e-6)
    wh = bwh * jnp.exp(reg[..., 2:])
    topleft = bxy + bwh * reg[..., :2] - 0.5 * wh
    t = jnp.linspace(0.0, 1.0, k).astype(reg.dtype)
    gx = topleft[..., 0:1] + wh[..., 0:1] * t          # (..., k)
    gy = topleft[..., 1:2] + wh[..., 1:2] * t
    # point (iy, ix): (gy[iy], gx[ix]); y varies slowest, x fastest
    yy = jnp.repeat(gy, k, axis=-1)                     # (..., k*k)
    xx = jnp.tile(gx, (1,) * (gx.ndim - 1) + (k,))
    pts = jnp.stack([yy, xx], -1).reshape(*reg.shape[:-1], -1)
    box = jnp.concatenate([topleft, topleft + wh], -1)
    return pts, box


class RepPointsHeadNet(nn.Module):
    num_classes: int
    num_points: int = 9
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    gradient_mul: float = 0.1
    transform_method: str = 'moment'
    moment_mul: float = 0.01
    use_grid_points: bool = False
    point_base_scale: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        k = int(np.sqrt(self.num_points))
        base = np.stack([np.repeat(np.arange(k) - k // 2, k),
                         np.tile(np.arange(k) - k // 2, k)],
                        -1).reshape(-1).astype(np.float32)  # (2*P) y-first
        dcn_base = jnp.asarray(base)
        cls_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                 name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvGNBlock(self.feat_channels, dtype=self.dtype,
                                 name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name='pts_init_conv')
        pts_out_dim = 4 if self.use_grid_points else 2 * self.num_points
        pts_init_out = nn.Conv(pts_out_dim, (1, 1),
                               dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               name='pts_init_out')
        cls_dconv = DeformConv(self.point_feat_channels, dtype=self.dtype,
                               name='cls_dconv')
        cls_out_conv = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               bias_init=nn.initializers.constant(
                                   _CLS_BIAS_INIT), name='cls_out')
        pts_refine_dconv = DeformConv(self.point_feat_channels,
                                      dtype=self.dtype,
                                      name='pts_refine_dconv')
        pts_refine_out = nn.Conv(pts_out_dim, (1, 1),
                                 dtype=self.dtype,
                                 kernel_init=nn.initializers.normal(0.01),
                                 name='pts_refine_out')
        moment = self.param('moment_transfer', nn.initializers.zeros, (2, )) \
            if self.transform_method == 'moment' else None

        cls_scores, sbox_inits, sbox_refines = [], [], []
        scale = self.point_base_scale / 2.0
        for x in feats:
            c, r = x, x
            for conv in cls_convs:
                c = conv(c)
            for conv in reg_convs:
                r = conv(r)
            raw_init = pts_init_out(
                nn.relu(pts_init_conv(r))).astype(jnp.float32)
            if self.use_grid_points:
                prev = jnp.broadcast_to(
                    jnp.asarray([-scale, -scale, scale, scale],
                                jnp.float32),
                    raw_init.shape[:-1] + (4, ))
                pts_init, bbox_init = gen_grid_from_reg(raw_init, prev, k)
            else:
                pts_init, bbox_init = raw_init, None
            pts_gm = (1 - self.gradient_mul) * \
                jax.lax.stop_gradient(pts_init) + \
                self.gradient_mul * pts_init
            dcn_offset = pts_gm - dcn_base[None, None, None, :]
            cls = cls_out_conv(nn.relu(cls_dconv(c, dcn_offset)))
            raw_refine = pts_refine_out(
                nn.relu(pts_refine_dconv(r, dcn_offset))).astype(
                    jnp.float32)
            if self.use_grid_points:
                pts_refine, _ = gen_grid_from_reg(
                    raw_refine, jax.lax.stop_gradient(bbox_init), k)
            else:
                pts_refine = raw_refine + jax.lax.stop_gradient(pts_init)
            cls_scores.append(cls.astype(jnp.float32))
            sbox_inits.append(points2bbox_shifts(
                pts_init, self.transform_method, moment, self.moment_mul))
            sbox_refines.append(points2bbox_shifts(
                pts_refine, self.transform_method, moment, self.moment_mul))
        return cls_scores, sbox_inits, sbox_refines


@HEADS.register_module()
class RepPointsHead:

    def __init__(self, num_classes=80, in_channels=256, feat_channels=256,
                 point_feat_channels=256, stacked_convs=3, num_points=9,
                 gradient_mul=0.1, point_strides=(8, 16, 32, 64, 128),
                 point_base_scale=4, transform_method='moment',
                 moment_mul=0.01, use_grid_points=False, center_init=True,
                 loss_cls=None, loss_bbox_init=None,
                 loss_bbox_refine=None, train_cfg=None, test_cfg=None,
                 norm_cfg=None, dtype=jnp.float32, **kwargs):
        self.num_classes = num_classes
        self.cls_out_channels = num_classes
        self.strides = tuple(point_strides)
        self.point_base_scale = point_base_scale
        self.loss_cls = LOSSES.build(loss_cls or dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0))
        self.loss_bbox_init = LOSSES.build(loss_bbox_init or dict(
            type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=0.5))
        self.loss_bbox_refine = LOSSES.build(loss_bbox_refine or dict(
            type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=1.0))
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or dict(
            nms_pre=1000, score_thr=0.05,
            nms=dict(type='nms', iou_threshold=0.5), max_per_img=100)
        init_cfg = dict(self.train_cfg.get('init', {}).get(
            'assigner', dict(scale=4, pos_num=1)))
        init_type = init_cfg.pop('type', 'PointAssigner')
        # the grid (bbox-representation) configs replace the init
        # PointAssigner with a MaxIoUAssigner over the base-scale boxes
        # (reference configs/reppoints/bbox_r50_grid_fpn_...py)
        self._init_is_maxiou = init_type == 'MaxIoUAssigner'
        if self._init_is_maxiou:
            self.init_assigner = MaxIoUAssigner(**init_cfg)
        else:
            self.init_assigner = PointAssigner(**init_cfg)
        refine_cfg = dict(self.train_cfg.get('refine', {}).get(
            'assigner', dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                             min_pos_iou=0.0)))
        refine_cfg.pop('type', None)
        self.refine_assigner = MaxIoUAssigner(**refine_cfg)
        self.net = RepPointsHeadNet(
            num_classes=num_classes, num_points=num_points,
            feat_channels=feat_channels,
            point_feat_channels=point_feat_channels,
            stacked_convs=stacked_convs, gradient_mul=gradient_mul,
            transform_method=transform_method, moment_mul=moment_mul,
            use_grid_points=use_grid_points,
            point_base_scale=float(point_base_scale), dtype=dtype)

    def _points(self, featmap_sizes):
        pts, strides, lvl_id = [], [], []
        for lvl, (h, w) in enumerate(featmap_sizes):
            s = float(self.strides[lvl])
            xs = np.tile(np.arange(w) * s, h)
            ys = np.repeat(np.arange(h) * s, w)
            pts.append(np.stack([xs, ys], -1).astype(np.float32))
            strides.append(np.full(h * w, s, np.float32))
            lvl_id.append(np.full(h * w, lvl, np.int32))
        return (jnp.asarray(np.concatenate(pts)),
                jnp.asarray(np.concatenate(strides)),
                jnp.asarray(np.concatenate(lvl_id)))

    def _flatten(self, lvl_list, c):
        b = lvl_list[0].shape[0]
        return jnp.concatenate([x.reshape(b, -1, c) for x in lvl_list], 1)

    def _shift_to_boxes(self, sbox, centers, strides):
        return sbox * strides[None, :, None] + jnp.concatenate(
            [centers, centers], -1)[None]

    def loss(self, outputs, batch, featmap_sizes) -> Dict[str, jnp.ndarray]:
        cls_scores, sbox_inits, sbox_refines = outputs
        centers, strides, lvl_id = self._points(featmap_sizes)
        num_lvl = [h * w for h, w in featmap_sizes]
        cls_flat = self._flatten(cls_scores, self.cls_out_channels)
        box_init = self._shift_to_boxes(
            self._flatten(sbox_inits, 4), centers, strides)
        box_refine = self._shift_to_boxes(
            self._flatten(sbox_refines, 4), centers, strides)
        pts3 = jnp.concatenate([centers, strides[:, None]], -1)

        half = 0.5 * self.point_base_scale * strides[:, None]
        base_boxes = jnp.concatenate([centers - half, centers + half], -1)

        def single(gtb, gtl, gtv, init_boxes):
            if self._init_is_maxiou:
                res_i = self.init_assigner.assign(
                    base_boxes, num_lvl, gtb, gtl, gtv,
                    num_classes=self.num_classes)
            else:
                res_i = self.init_assigner.assign(
                    pts3, num_lvl, gtb, gtl, gtv,
                    num_classes=self.num_classes)
            safe_i = jnp.clip(res_i.assigned_gt_inds, 0)
            res_r = self.refine_assigner.assign(
                jax.lax.stop_gradient(init_boxes), num_lvl, gtb, gtl, gtv,
                num_classes=self.num_classes)
            safe_r = jnp.clip(res_r.assigned_gt_inds, 0)
            return (res_i.pos_mask, gtb[safe_i], res_r.pos_mask,
                    gtb[safe_r], res_r.labels)

        pos_i, tgt_i, pos_r, tgt_r, labels = jax.vmap(single)(
            batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
            box_init)

        norm = (self.point_base_scale * strides)[None, :, None]
        pos_if = pos_i.astype(jnp.float32)
        pos_rf = pos_r.astype(jnp.float32)
        n_init = jnp.maximum(pos_if.sum(), 1.0)
        n_refine = jnp.maximum(pos_rf.sum(), 1.0)
        loss_pts_init = self.loss_bbox_init(
            (box_init / norm).reshape(-1, 4), (tgt_i / norm).reshape(-1, 4),
            weight=jnp.repeat(pos_if.reshape(-1, 1), 4, 1),
            avg_factor=n_init * 4)
        loss_pts_refine = self.loss_bbox_refine(
            (box_refine / norm).reshape(-1, 4),
            (tgt_r / norm).reshape(-1, 4),
            weight=jnp.repeat(pos_rf.reshape(-1, 1), 4, 1),
            avg_factor=n_refine * 4)
        loss_cls = self.loss_cls(cls_flat, labels, avg_factor=n_refine)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_pts_init,
                    loss_pts_refine=loss_pts_refine)

    def get_bboxes(self, outputs, img_hw, scale_factor=None, rescale=False,
                   cfg=None, with_nms=True):
        cfg = cfg or self.test_cfg
        cls_scores, _, sbox_refines = outputs
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        centers, strides, _ = self._points(featmap_sizes)
        lvl_sizes = [h * w for h, w in featmap_sizes]
        nms_pre = cfg.get('nms_pre', 1000)

        def per_image(cls_list, sbox_list, hw, sf):
            boxes_all, scores_all = [], []
            lo = 0
            for lvl in range(len(featmap_sizes)):
                n_lvl = lvl_sizes[lvl]
                scores = jax.nn.sigmoid(
                    cls_list[lvl].reshape(-1, self.cls_out_channels))
                sbox = sbox_list[lvl].reshape(-1, 4)
                ctr = centers[lo:lo + n_lvl]
                s = strides[lo:lo + n_lvl]
                if nms_pre > 0 and n_lvl > nms_pre:
                    _, topk = topk_flat(scores.max(-1), nms_pre)
                    scores, sbox, ctr, s = (scores[topk], sbox[topk],
                                            ctr[topk], s[topk])
                boxes = sbox * s[:, None] + jnp.concatenate([ctr, ctr], -1)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, hw[1]),
                    jnp.clip(boxes[:, 1], 0, hw[0]),
                    jnp.clip(boxes[:, 2], 0, hw[1]),
                    jnp.clip(boxes[:, 3], 0, hw[0])], -1)
                boxes_all.append(boxes)
                scores_all.append(scores)
                lo += n_lvl
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and sf is not None:
                boxes = boxes / sf[None, :]
            return multiclass_nms(
                boxes, scores, cfg.get('score_thr', 0.05),
                cfg.get('nms', {}).get('iou_threshold', 0.5),
                max_per_img=cfg.get('max_per_img', 100))

        b = cls_scores[0].shape[0]
        if scale_factor is None:
            scale_factor = jnp.ones((b, 4))
        return jax.vmap(per_image)(
            [c for c in cls_scores], [s for s in sbox_refines], img_hw,
            scale_factor)
